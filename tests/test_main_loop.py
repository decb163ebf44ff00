"""End-to-end smoke test of the top-level training loop on synthetic data."""
import os

import numpy as np
import pytest

from ov3det.main import config_from_args, do_train, make_args_parser
from ov3det.main import test_model as run_test_model


@pytest.mark.slow
def test_train_loop_synthetic(tmp_path):
    argv = [
        "--dataset_name", "synthetic",
        "--checkpoint_dir", str(tmp_path / "run"),
        "--max_epoch", "2",
        "--eval_every_epoch", "1",
        "--batchsize_per_gpu", "4",
        "--num_points", "512",
        "--preenc_npoints", "128",
        "--enc_nlayers", "2",
        "--enc_dim", "64",
        "--enc_ffn_dim", "64",
        "--dec_nlayers", "2",
        "--dec_dim", "64",
        "--dec_ffn_dim", "64",
        "--nqueries", "32",
        "--mlp_dropout", "0.0",
        "--loss_giou_weight", "1",
        "--log_every", "5",
        "--log_metrics_every", "10",
        "--eval_loss",
    ]
    args = make_args_parser().parse_args(argv)
    cfg = config_from_args(args)
    # shrink the pre-encoder MLP for test speed
    from ov3det.config import replace as cfg_replace
    from dataclasses import replace as dc_replace

    cfg = cfg_replace(cfg, model=dc_replace(cfg.model, preenc_mlp=(32, 64, 64), clip_embed_dim=64))

    do_train(cfg)
    run = str(tmp_path / "run")
    assert os.path.isdir(os.path.join(run, "checkpoint"))
    assert os.path.isdir(os.path.join(run, "checkpoint_best"))
    assert os.path.isfile(os.path.join(run, "final_eval.txt"))
    assert os.path.isfile(os.path.join(run, "scalars.jsonl"))
    content = open(os.path.join(run, "final_eval.txt")).read()
    assert "mAP0.25" in content
    # --eval_loss: in-training evals log the criterion breakdown under
    # Test_details/ and the smoothed total under Test/loss (reference
    # engine.py:226-229 schema)
    import json

    scalars = [json.loads(line)
               for line in open(os.path.join(run, "scalars.jsonl"))]
    keys = {k for s in scalars for k in s}
    assert any(k.startswith("Test_details/loss_giou") for k in keys), keys
    assert any(k.startswith("Test_details/loss_sem_cls") for k in keys), keys
    assert "Test/loss" in keys

    # idempotent re-run guard (reference main.py:226-231)
    do_train(cfg)

    # test-only path restores the checkpoint and evaluates
    m = run_test_model(cfg)
    assert 0.25 in m and "mAP" in m[0.25]


def test_run_scripts_use_valid_flags():
    """Every flag in scripts/*.sh must exist on the CLI parsers (the
    reference ships 7 canned configs, scripts/*.sh; a renamed flag would
    silently break them)."""
    import glob
    import re

    from ov3det.generate_pseudo_label import make_pseudo_label_parser
    from ov3det.main import make_args_parser

    known = set()
    for p in (make_args_parser(), make_pseudo_label_parser()):
        for a in p._actions:
            known.update(a.option_strings)
    scripts = sorted(glob.glob(os.path.join(os.path.dirname(__file__),
                                            "..", "scripts", "*.sh")))
    assert len(scripts) == 7
    for fn in scripts:
        for flag in re.findall(r"--[a-z0-9_]+", open(fn).read()):
            assert flag in known, (fn, flag)


@pytest.mark.slow
def test_profile_and_debug_nans_flags(tmp_path):
    """--profile_dir writes a jax.profiler trace around the first steps;
    --debug_nans toggles the jax config (SURVEY §5.1/5.2)."""
    import glob

    import jax

    from ov3det.main import main as cli_main

    prof = tmp_path / "prof"
    argv = [
        "--dataset_name", "synthetic",
        "--checkpoint_dir", str(tmp_path / "run"),
        "--max_epoch", "1",
        "--eval_every_epoch", "5",
        "--batchsize_per_gpu", "4",
        "--num_points", "256",
        "--preenc_npoints", "64",
        "--enc_nlayers", "1", "--enc_dim", "32", "--enc_ffn_dim", "32",
        "--dec_nlayers", "1", "--dec_dim", "32", "--dec_ffn_dim", "32",
        "--nqueries", "16", "--mlp_dropout", "0.0",
        "--profile_dir", str(prof), "--profile_steps", "2",
        "--debug_nans",
    ]
    try:
        cli_main(argv)
        assert jax.config.jax_debug_nans
        traces = glob.glob(str(prof / "**" / "*.xplane.pb"), recursive=True)
        assert traces, f"no profiler trace under {prof}"
    finally:
        jax.config.update("jax_debug_nans", False)


@pytest.mark.slow
def test_train_loop_super_batch(tmp_path):
    """--super_batch 2 routes training through the grouped packed_device
    transfer: the zero-copy direct-write loader rings + per-row group
    dispatches (engine.make_packed_group_step) carry the whole epoch."""
    from ov3det.main import main as cli_main

    run = tmp_path / "run_sb"
    argv = [
        "--dataset_name", "synthetic",
        "--checkpoint_dir", str(run),
        "--max_epoch", "1",
        "--eval_every_epoch", "5",
        "--batchsize_per_gpu", "4",
        "--num_points", "256",
        "--preenc_npoints", "64",
        "--enc_nlayers", "1", "--enc_dim", "32", "--enc_ffn_dim", "32",
        "--dec_nlayers", "1", "--dec_dim", "32", "--dec_ffn_dim", "32",
        "--nqueries", "16", "--mlp_dropout", "0.0",
        "--super_batch", "2",
        "--log_every", "4",
    ]
    cli_main(argv)
    assert os.path.isfile(os.path.join(str(run), "final_eval.txt"))
    import json

    scalars = [json.loads(line)
               for line in open(os.path.join(str(run), "scalars.jsonl"))]
    losses = [s["Train/loss"] for s in scalars if "Train/loss" in s]
    assert losses and all(np.isfinite(l) for l in losses), losses
