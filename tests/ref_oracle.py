"""Working torch stand-ins for the reference's external CUDA dependencies.

The reference imports `third_party.pointnet2` (CUDA FPS / ball query /
grouping, reference models/model_3detr.py:8-9) which is not vendored and
has no CPU build.  For whole-model forward-parity tests we inject *working*
pure-torch implementations with CUDA-kernel semantics (exact greedy FPS
seeded at index 0; first-K in-radius neighbors in index order, tail padded
with the first hit) so the reference torch `Model3DETR` runs end-to-end on
CPU and can be compared numerically against the ov3det flax model driven by
the same semantics (ops.pointcloud with ball_query_method="first_k",
fps_shards=1).

The module tree of `PointnetSAModuleVotes` reproduces the external
package's state_dict key layout (`mlp_module.layer{i}.conv.weight`,
`mlp_module.layer{i}.bn.bn.*`) so `convert_3detr_checkpoint` maps it the
same way it maps a real published checkpoint.
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def furthest_point_sample(xyz: torch.Tensor, npoint: int) -> torch.Tensor:
    """Exact greedy FPS (B, N, 3) -> (B, npoint) int32, CUDA-parity."""
    B, N, _ = xyz.shape
    inds = torch.zeros(B, npoint, dtype=torch.int64)
    min_d2 = torch.full((B, N), 1e10, dtype=torch.float32)
    last = xyz[:, 0, :]
    for i in range(1, npoint):
        d2 = ((xyz - last[:, None, :]) ** 2).sum(-1)
        min_d2 = torch.minimum(min_d2, d2)
        nxt = min_d2.argmax(dim=-1)  # ties -> lowest index
        inds[:, i] = nxt
        last = xyz[torch.arange(B), nxt]
    return inds.int()


def ball_query_first_k(
    xyz: torch.Tensor, centers: torch.Tensor, radius: float, nsample: int
) -> torch.Tensor:
    """First `nsample` in-radius points in index order, pad with first hit.

    Distances use the |c|^2 + |x|^2 - 2 c.x expansion to match the jnp
    implementation's rounding at the d2 < r^2 boundary (ops.pointcloud).
    """
    B, N, _ = xyz.shape
    c2 = (centers**2).sum(-1)
    x2 = (xyz**2).sum(-1)
    d2 = c2[:, :, None] + x2[:, None, :] - 2.0 * torch.einsum(
        "bmd,bnd->bmn", centers, xyz
    )
    in_ball = d2 < radius * radius
    order = torch.arange(N)
    scores = torch.where(in_ball, order[None, None, :], torch.tensor(N))
    idx = torch.topk(-scores, nsample, dim=-1).indices  # ascending scores
    count = in_ball.sum(-1, keepdim=True)
    slot = torch.arange(nsample)[None, None, :]
    idx = torch.where(slot < count, idx, idx[..., 0:1])
    return idx


class _BNWrap(nn.Module):
    """pt_utils._BNBase lookalike: child named `bn` -> keys `bn.bn.*`."""

    def __init__(self, width: int):
        super().__init__()
        self.bn = nn.BatchNorm2d(width)

    def forward(self, x):
        return self.bn(x)


class _ConvBN(nn.Module):
    """pt_utils Conv2d lookalike: children `conv` + `bn`, fused relu."""

    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, kernel_size=1, bias=False)
        self.bn = _BNWrap(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class SharedMLP(nn.Sequential):
    def __init__(self, spec):
        super().__init__()
        for i in range(len(spec) - 1):
            self.add_module(f"layer{i}", _ConvBN(spec[i], spec[i + 1]))


class PointnetSAModuleVotes(nn.Module):
    """Votenet-lineage SA module: FPS -> ball query -> group -> MLP -> max."""

    def __init__(
        self,
        *,
        mlp,
        npoint=None,
        radius=None,
        nsample=None,
        bn=True,
        use_xyz=True,
        normalize_xyz=False,
        **_,
    ):
        super().__init__()
        assert bn and use_xyz, "reference always uses bn+xyz"
        self.npoint, self.radius, self.nsample = npoint, radius, nsample
        self.normalize_xyz = normalize_xyz
        spec = list(mlp)
        spec[0] += 3  # use_xyz prepends relative coordinates
        self.mlp_module = SharedMLP(spec)

    def forward(self, xyz, features=None, inds=None):
        if inds is None:
            inds = furthest_point_sample(xyz, self.npoint)
        new_xyz = torch.gather(xyz, 1, inds.long()[..., None].expand(-1, -1, 3))
        gidx = ball_query_first_k(xyz, new_xyz, self.radius, self.nsample)
        B, M, K = gidx.shape
        flat = gidx.reshape(B, M * K)
        g_xyz = torch.gather(xyz, 1, flat[..., None].expand(-1, -1, 3))
        rel = g_xyz.reshape(B, M, K, 3) - new_xyz[:, :, None, :]
        if self.normalize_xyz:
            rel = rel / self.radius
        grouped = rel.permute(0, 3, 1, 2)  # (B, 3, M, K)
        if features is not None:
            C = features.shape[1]  # (B, C, N) layout
            g_feat = torch.gather(
                features, 2, flat[:, None, :].expand(-1, C, -1)
            ).reshape(B, C, M, K)
            grouped = torch.cat([grouped, g_feat], dim=1)
        h = self.mlp_module(grouped)
        h = F.max_pool2d(h, kernel_size=[1, K]).squeeze(-1)  # (B, Cout, M)
        return new_xyz, h, inds


def install_working_pointnet2():
    """(Re)install the working stubs; call before importing the ref model.

    Other parity tests (tests/test_convert.py) stub the pointnet2 symbols
    with dead placeholders and import reference modules that bind those
    placeholders into their own namespaces — so besides refreshing the stub
    modules we must evict every cached reference module, forcing re-import
    against the working stand-ins.
    """
    import sys

    from tests.conftest import REFERENCE_ROOT, stub_module

    for name, mod in list(sys.modules.items()):
        f = getattr(mod, "__file__", None) or ""
        if f.startswith(REFERENCE_ROOT):
            del sys.modules[name]

    stub_module(
        "third_party.pointnet2.pointnet2_modules",
        PointnetSAModuleVotes=PointnetSAModuleVotes,
    )
    stub_module(
        "third_party.pointnet2.pointnet2_utils",
        furthest_point_sample=furthest_point_sample,
    )
    # the reference models package imports its RegionCLIP wrapper eagerly;
    # detectron2 is never exercised by the detector parity path
    stub_module("detectron2.structures", Boxes=object, Instances=object)
    stub_module("detectron2.modeling.meta_arch", CLIPFastRCNN=object)
    stub_module("detectron2.config", get_cfg=lambda: None)
    stub_module("detectron2.checkpoint", DetectionCheckpointer=object)


# ---------------------------------------------------------------------------
# CLIP ModifiedResNet oracle (RegionCLIP visual tower)
# ---------------------------------------------------------------------------
# Architecture follows the public CLIP RN design the RegionCLIP checkpoint
# stores (reference models/model_regionclip.py wraps it via detectron2):
# 3-conv anti-aliased stem, Bottleneck stages with avgpool downsampling,
# AttentionPool2d head.  State-dict key layout matches a real checkpoint
# (conv1/bn1..., layer{1..4}.{i}.conv{j}/bn{j}, downsample.0/.1, attnpool.*)
# so convert_torch_checkpoint maps it exactly like the published weights.


class CLIPBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            mods = []
            if stride > 1:
                mods.append(("-1", nn.AvgPool2d(stride)))
            mods += [
                ("0", nn.Conv2d(inplanes, planes * 4, 1, stride=1, bias=False)),
                ("1", nn.BatchNorm2d(planes * 4)),
            ]
            import collections

            self.downsample = nn.Sequential(collections.OrderedDict(mods))

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class CLIPAttentionPool2d(nn.Module):
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial_dim**2 + 1, embed_dim) / embed_dim**0.5
        )
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):
        x = x.flatten(start_dim=2).permute(2, 0, 1)  # NCHW -> (HW)NC
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None, :]
        out, _ = F.multi_head_attention_forward(
            query=x[:1], key=x, value=x,
            embed_dim_to_check=x.shape[-1],
            num_heads=self.num_heads,
            q_proj_weight=self.q_proj.weight,
            k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight,
            in_proj_weight=None,
            in_proj_bias=torch.cat(
                [self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]
            ),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
            out_proj_weight=self.c_proj.weight,
            out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True,
            training=False, need_weights=False,
        )
        return out.squeeze(0)


class CLIPModifiedResNet(nn.Module):
    """Full visual tower; forward_res4/forward_res5 split mirrors
    RegionCLIP's backbone / RoI-head split."""

    def __init__(self, layers, output_dim, width=64, image_resolution=288):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self.relu = nn.ReLU(inplace=True)
        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0])
        self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
        self.layer4 = self._make_layer(width * 8, layers[3], stride=2)
        embed_dim = width * 32
        self.attnpool = CLIPAttentionPool2d(
            image_resolution // 32, embed_dim, embed_dim // 64, output_dim
        )

    def _make_layer(self, planes, blocks, stride=1):
        layers = [CLIPBottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * CLIPBottleneck.expansion
        for _ in range(1, blocks):
            layers.append(CLIPBottleneck(self._inplanes, planes))
        return nn.Sequential(*layers)

    def forward_res4(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        return self.layer3(x)

    def forward_res5(self, pooled):
        return self.attnpool(self.layer4(pooled))


def roi_align_oracle(features, boxes, batch_idx, spatial_scale, output_size,
                     sampling_ratio=2):
    """Direct per-box numpy RoIAlign, torchvision aligned=True spec.

    features: (B, H, W, C) channels-last numpy; boxes (R, 4) xyxy pixels.
    Implements the exact bilinear_interpolate rules of the torchvision CUDA/
    CPU kernel (zero outside [-1, H], clamp at borders) as an independent
    oracle for ov3det.ops.roi_align.
    """
    import numpy as np

    B, H, W, C = features.shape
    R = boxes.shape[0]
    P, s = output_size, sampling_ratio
    out = np.zeros((R, P, P, C), np.float32)

    def interp(feat, y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C, np.float32)
        y, x = max(y, 0.0), max(x, 0.0)
        y0, x0 = int(y), int(x)
        y1, x1 = y0 + 1, x0 + 1
        if y0 >= H - 1:
            y0 = y1 = H - 1
            y = float(y0)
        if x0 >= W - 1:
            x0 = x1 = W - 1
            x = float(x0)
        ly, lx = y - y0, x - x0
        return (
            feat[y0, x0] * (1 - ly) * (1 - lx)
            + feat[y0, x1] * (1 - ly) * lx
            + feat[y1, x0] * ly * (1 - lx)
            + feat[y1, x1] * ly * lx
        )

    for r in range(R):
        feat = features[batch_idx[r]]
        x1, y1, x2, y2 = boxes[r] * spatial_scale
        x1, y1, x2, y2 = x1 - 0.5, y1 - 0.5, x2 - 0.5, y2 - 0.5
        bh, bw = (y2 - y1) / P, (x2 - x1) / P
        for iy in range(P):
            for ix in range(P):
                acc = np.zeros(C, np.float32)
                for ky in range(s):
                    for kx in range(s):
                        yy = y1 + (iy + (ky + 0.5) / s) * bh
                        xx = x1 + (ix + (kx + 0.5) / s) * bw
                        acc += interp(feat, yy, xx)
                out[r, iy, ix] = acc / (s * s)
    return out
