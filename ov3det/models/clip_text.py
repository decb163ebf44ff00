"""CLIP text encoder (flax) for open-vocabulary class-embedding extraction.

Counterpart of the CLIP RN50x4 `encode_text` path the reference uses to
build its frozen classifier matrix (reference
3DOVDet_tools/extract_class_features.py:14-36): a causal transformer over
BPE tokens, final LayerNorm, EOT-token pooling, and projection into the
joint embedding space (640-d for RN50x4).

Tokenization requires CLIP's BPE vocabulary file (not vendored); the
encoder accepts pre-tokenized id arrays, and `simple_tokenize` supports the
standard merges file when a path is supplied.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST

# standard CLIP prompt templates used for classifier-embedding ensembling
PROMPT_TEMPLATES = [
    "a photo of a {}.",
    "a photo of the {}.",
    "a photo of one {}.",
    "itap of a {}.",
    "a bad photo of the {}.",
    "a origami {}.",
    "a photo of the large {}.",
    "a {} in a video game.",
    "art of the {}.",
    "a photo of the small {}.",
    "there is a {} in the scene.",
    "there is the {} in the scene.",
    "this is a {} in the scene.",
    "this is the {} in the scene.",
    "this is one {} in the scene.",
]


class CLIPTextEncoder(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 640  # RN50x4
    heads: int = 10
    layers: int = 12
    embed_dim: int = 640

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        """token_ids: (B, context_length) int32 -> (B, embed_dim)."""
        B, T = token_ids.shape
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02), (self.vocab_size, self.width)
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (self.context_length, self.width)
        )
        x = tok[token_ids] + pos[None, :T]
        causal = jnp.tril(jnp.ones((T, T), bool))[None, None]
        for i in range(self.layers):
            y = nn.LayerNorm(epsilon=1e-5, name=f"ln1_{i}")(x)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=self.width, name=f"attn_{i}"
            )(y, y, y, mask=causal)
            x = x + y
            y = nn.LayerNorm(epsilon=1e-5, name=f"ln2_{i}")(x)
            y = nn.Dense(self.width * 4, name=f"mlp_fc_{i}")(y)
            y = y * jax.nn.sigmoid(1.702 * y)  # QuickGELU
            y = nn.Dense(self.width, name=f"mlp_proj_{i}")(y)
            x = x + y
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # pool at the EOT token (highest token id in CLIP's vocab)
        eot = jnp.argmax(token_ids, axis=-1)
        pooled = x[jnp.arange(B), eot]
        proj = self.param(
            "text_projection", nn.initializers.normal(self.width**-0.5),
            (self.width, self.embed_dim),
        )
        return jnp.einsum("bw,we->be", pooled, proj, precision=_HI)


def convert_text_checkpoint(path: str, layers: int = 12) -> dict:
    """Convert the text branch of a CLIP/RegionCLIP torch checkpoint."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    prefix = ""
    for cand in ("lang_encoder.", "text_encoder.", ""):
        if f"{cand}transformer.resblocks.0.attn.in_proj_weight" in sd:
            prefix = cand
            break

    def g(k):
        return sd[prefix + k]

    params = {
        "token_embedding": g("token_embedding.weight"),
        "positional_embedding": g("positional_embedding"),
        "text_projection": g("text_projection"),
        "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
    }
    width = params["token_embedding"].shape[1]
    for i in range(layers):
        p = f"transformer.resblocks.{i}."
        in_w = g(p + "attn.in_proj_weight")  # (3w, w)
        in_b = g(p + "attn.in_proj_bias")
        qw, kw, vw = np.split(in_w, 3, axis=0)
        qb, kb, vb = np.split(in_b, 3, axis=0)
        heads = width // 64
        def split_heads(w):  # (w, w) dense kernel -> flax MHA (w, h, hd)
            return w.T.reshape(width, heads, width // heads)
        params[f"attn_{i}"] = {
            "query": {"kernel": split_heads(qw), "bias": qb.reshape(heads, -1)},
            "key": {"kernel": split_heads(kw), "bias": kb.reshape(heads, -1)},
            "value": {"kernel": split_heads(vw), "bias": vb.reshape(heads, -1)},
            "out": {
                "kernel": g(p + "attn.out_proj.weight").T.reshape(heads, width // heads, width),
                "bias": g(p + "attn.out_proj.bias"),
            },
        }
        params[f"ln1_{i}"] = {"scale": g(p + "ln_1.weight"), "bias": g(p + "ln_1.bias")}
        params[f"ln2_{i}"] = {"scale": g(p + "ln_2.weight"), "bias": g(p + "ln_2.bias")}
        params[f"mlp_fc_{i}"] = {
            "kernel": g(p + "mlp.c_fc.weight").T, "bias": g(p + "mlp.c_fc.bias")
        }
        params[f"mlp_proj_{i}"] = {
            "kernel": g(p + "mlp.c_proj.weight").T, "bias": g(p + "mlp.c_proj.bias")
        }
    return {"params": params}


class SimpleBPETokenizer:
    """CLIP's byte-pair tokenizer, loaded from the standard merges file.

    The merges vocabulary (`bpe_simple_vocab_16e6.txt.gz`) is not vendored
    (zero-egress build); supply a local copy.  Algorithm follows the public
    CLIP tokenizer: byte-level unicode mapping, lowercase, basic regex
    splitting, greedy lowest-rank pair merging, `</w>` end-of-word marker.
    """

    def __init__(self, bpe_path: str, context_length: int = 77):
        import gzip
        import html
        import re

        self._re = re
        self._html = html
        self.context_length = context_length
        self.byte_encoder = self._bytes_to_unicode()
        merges = gzip.open(bpe_path, "rt", encoding="utf-8").read().split("\n")
        merges = [tuple(m.split()) for m in merges[1 : 49152 - 256 - 2 + 1]]
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {}
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
            r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"""
            if hasattr(re, "Pattern") and False
            else r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""",
            re.IGNORECASE,
        )

    @staticmethod
    def _bytes_to_unicode():
        bs = (
            list(range(ord("!"), ord("~") + 1))
            + list(range(ord("\xa1"), ord("\xac") + 1))
            + list(range(ord("\xae"), ord("\xff") + 1))
        )
        cs = bs[:]
        n = 0
        for b in range(256):
            if b not in bs:
                bs.append(b)
                cs.append(256 + n)
                n += 1
        return dict(zip(bs, [chr(c) for c in cs]))

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        text = self._html.unescape(self._html.unescape(text)).strip().lower()
        text = self._re.sub(r"\s+", " ", text)
        tokens = []
        for tok in self._re.findall(self.pat, text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            tokens.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
        return tokens

    def __call__(self, texts) -> np.ndarray:
        """texts: list[str] -> (len(texts), context_length) int32 ids."""
        sot = self.encoder["<|startoftext|>"]
        eot = self.encoder["<|endoftext|>"]
        out = np.zeros((len(texts), self.context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [sot] + self.encode(t)[: self.context_length - 2] + [eot]
            out[i, : len(ids)] = ids
        return out


def tokenize_prompts(class_names, tokenizer, templates=PROMPT_TEMPLATES):
    """class names -> (C, num_templates, context_len) prompt token ids."""
    rows = [
        tokenizer([tpl.format(name) for tpl in templates]) for name in class_names
    ]
    return np.stack(rows, 0)


def extract_class_embeddings(
    encoder: CLIPTextEncoder,
    variables: dict,
    tokenized_prompts: np.ndarray,  # (num_classes, num_templates, context_len)
) -> np.ndarray:
    """Prompt-ensembled class embeddings (reference
    extract_class_features.py:25-33): per class, encode every template,
    L2-normalize, average, re-normalize."""
    C, P, T = tokenized_prompts.shape
    flat = jnp.asarray(tokenized_prompts.reshape(C * P, T))
    feats = jax.jit(encoder.apply)(variables, flat)
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    feats = jnp.mean(feats.reshape(C, P, -1), axis=1)
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return np.asarray(feats)
