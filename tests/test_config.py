"""Config-system tests.

The critical invariant: ``default_config()`` (the no-file default tree used
by bench.py, tests, and library embedders) must agree with
``configs/base.yaml`` (the file CLI users load). Round 3 shipped a real
defaults-drift bug — ``tpu.consecutive_half_reuse`` and ``max_edges`` were
flipped in base.yaml but not in default_config(), so ``make_config()`` with
no path (bench.py!) silently ran the old defaults.
"""

import pathlib

from frodo_slam_tpu.config import _load_chain, default_config, make_config

REPO = pathlib.Path(__file__).resolve().parents[1]


def _leaves(tree, prefix=""):
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            yield from _leaves(v, key)
        else:
            yield key, v


def test_base_yaml_matches_default_config():
    """Every leaf in configs/base.yaml must equal default_config()'s value.

    base.yaml may omit keys (defaults fill them) but must never DISAGREE —
    a knob changed in one place and not the other is exactly the bug class
    this guards against. Float comparison is exact: both sides are written
    as the same literal."""
    yaml_cfg = _load_chain(REPO / "configs" / "base.yaml")
    defaults = default_config()
    mismatches = []
    for key, v in _leaves(yaml_cfg):
        node = defaults
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.get(p, {})
        if parts[-1] not in node:
            mismatches.append(f"{key}: in base.yaml but missing from default_config()")
        elif node[parts[-1]] != v:
            mismatches.append(
                f"{key}: base.yaml={v!r} default_config()={node[parts[-1]]!r}"
            )
    assert not mismatches, "base.yaml vs default_config() drift:\n" + "\n".join(mismatches)


def test_make_config_defaults_have_round3_knobs():
    """The knobs the round-3 perf defaults depend on must be present in the
    no-file default tree (bench.py reads them via make_config())."""
    cfg = make_config()
    assert cfg.tpu.get("consecutive_half_reuse") is True
    assert cfg.matching.get("dilation_max_warm") == -1
    assert cfg.tpu.get("head_dtype") == "float32"


def test_apply_tpu_model_knobs():
    import jax.numpy as jnp

    from frodo_slam_tpu.loader import apply_tpu_model_knobs
    from frodo_slam_tpu.models import mast3r

    base = mast3r.tiny_config()
    out = apply_tpu_model_knobs(
        base, {"tpu": {"head_dtype": "bfloat16", "attention_impl": "pallas"}})
    assert out.head_dtype == jnp.bfloat16
    assert out.attention_impl == "pallas"
    # untouched fields survive
    assert out.enc_depth == base.enc_depth and out.dtype == base.dtype
    # no knobs -> untouched
    out2 = apply_tpu_model_knobs(base, {"tpu": {}})
    assert out2.head_dtype == base.head_dtype and out2.dtype == base.dtype
    # the full default tree applies its dtype contract (enc/dec bf16, heads f32)
    out3 = apply_tpu_model_knobs(base, make_config())
    assert out3.dtype == jnp.bfloat16 and out3.head_dtype == jnp.float32


def test_apply_x64_knob_profiles():
    """tpu.x64_eval: eval entry points default ON, robot defaults OFF,
    realtime.yaml forces OFF, eval configs force ON (VERDICT r4 weak #2:
    every committed CLI must be able to run at the benched speed)."""
    import jax

    from frodo_slam_tpu.config import apply_x64_knob, make_config

    prev = jax.config.jax_enable_x64
    try:
        # base.yaml carries no knob: the entry point's default decides
        assert apply_x64_knob(make_config("/root/repo/configs/base.yaml"),
                              entry_default=True) is True
        assert jax.config.jax_enable_x64
        assert apply_x64_knob(make_config("/root/repo/configs/base.yaml"),
                              entry_default=False) is False
        assert not jax.config.jax_enable_x64
        # realtime profile: x64 OFF even through the eval-defaulting CLIs
        assert apply_x64_knob(make_config("/root/repo/configs/realtime.yaml"),
                              entry_default=True) is False
        # eval profiles: x64 ON even through the robot entry point
        assert apply_x64_knob(make_config("/root/repo/configs/eval_calib.yaml"),
                              entry_default=False) is True
        assert apply_x64_knob(
            make_config("/root/repo/configs/eval_no_calib.yaml"),
            entry_default=False) is True
    finally:
        jax.config.update("jax_enable_x64", prev)
