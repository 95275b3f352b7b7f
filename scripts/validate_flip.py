"""Numeric-equivalence gate for kernel-variant flips.

measure_round4.py's end-to-end validation used to check only that a
synthetic eval EXITS 0 with the flipped configuration — which would not
catch a flipped kernel silently moving the metric: fused_decoder_stack
is tolerance-equal, not bit-exact (ops/fused_decoder.py module
docstring: bf16-rounded hop stack, in-kernel glue weights, polynomial
erf). This script compares DECODED KEYPOINT COORDINATES between the
hardware-validated chain configuration (all variant switches off) and
the flipped configuration (switches as pallas_tuned.json enables them)
on the same inputs and weights, with a SELF-CALIBRATED tolerance:

    sens   = max |chain(x) - chain(x + 1e-3)|   (the model's own
             sensitivity at these weights — the 3-layer sigmoid
             refinement is chaotic at random init, so a fixed px
             tolerance would either be flaky or vacuous)
    tol    = safety * sens + floor
    verdict ok  <=>  max |chain(x) - flipped(x)| <= tol

Guards the eval protocol of the reference (test_base_dataset.py:119-155
computes PCK from exactly these decoded coordinates).

TRAP defended (see docs/performance.md): KptBranch.out is zero-init, so
at raw random init the decoder is an IDENTITY on coordinates and any
decoder comparison passes vacuously. All all-zero parameter leaves are
re-randomized before comparing, so the decoder path is genuinely live.

Prints ONE JSON line {"ok", "max_delta_px", "sens_px", "tol_px",
"switches"}; exit 0 when ok. `--inject-delta=X` offsets the flipped
coordinates by X px (test hook for measure_round4's rollback path).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _randomize_zero_leaves(params, rng, scale=0.02):
    """Replace all-zero float leaves (zero-init output heads, zero-convs)
    with small seeded noise so zero-init branches contribute."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(params)
    out = []
    for i, leaf in enumerate(leaves):
        if (hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
                and leaf.size and not bool(jnp.any(leaf))):
            k = jax.random.fold_in(rng, i)
            leaf = scale * jax.random.normal(k, leaf.shape, leaf.dtype)
        out.append(leaf)
    return jax.tree.unflatten(treedef, out)


def main() -> int:
    small = "--small" in sys.argv
    inject = 0.0
    safety, floor = 4.0, 0.5
    for a in sys.argv[1:]:
        if a.startswith("--inject-delta="):
            inject = float(a.split("=")[1])
        if a.startswith("--tol-safety="):
            safety = float(a.split("=")[1])
        if a.startswith("--tol-floor="):
            floor = float(a.split("=")[1])

    from edgecape_tpu.utils.runtime import honor_env_platforms
    honor_env_platforms()

    import jax
    import numpy as np

    from edgecape_tpu.api import PoseEstimator
    from edgecape_tpu.config import Config, DataConfig, ModelConfig
    from edgecape_tpu.models import dinov2
    from edgecape_tpu.ops import pallas_config as pc

    if small:   # toy shapes: CPU-interpretable for the unit tests
        mcfg = ModelConfig(image_size=56, heatmap_size=16, max_kpt=16,
                           learn_skeleton=True, attn_bias=True,
                           use_bias_attn_module=True, use_flash=True,
                           compute_dtype="bfloat16", head_dtype="bfloat16")
        bb_cfg, groups = dinov2.DinoV2Config(depth=2), 2
    else:       # the shipped fast recipe at production shape
        mcfg = ModelConfig(learn_skeleton=True, attn_bias=True,
                           use_bias_attn_module=True, use_flash=True,
                           compute_dtype="bfloat16", head_dtype="bfloat16")
        bb_cfg, groups = dinov2.VIT_S14, 2

    size, k, s = mcfg.image_size, mcfg.max_kpt, 1
    nq = groups * 5
    rng = np.random.default_rng(0)
    support = {
        "img_s": rng.normal(size=(groups, s, size, size, 3)).astype(
            np.float32),
        "joints_s": rng.uniform(5, size - 5,
                                size=(groups, s, k, 2)).astype(np.float32),
        "vis_s": np.ones((groups, s, k), np.float32),
        "binary_adj": np.tile(np.eye(k, k=1, dtype=np.float32)
                              + np.eye(k, k=-1, dtype=np.float32),
                              (groups, 1, 1)),
    }
    img_q = rng.normal(size=(nq, size, size, 3)).astype(np.float32)
    group = np.repeat(np.arange(groups, dtype=np.int32), 5)

    # one set of weights, zero-leaves randomized, shared by all runs
    proto = PoseEstimator(Config(model=mcfg,
                                 test_data=DataConfig(image_size=size)),
                          rng=jax.random.PRNGKey(0))
    proto.backbone_cfg = bb_cfg
    head_params = _randomize_zero_leaves(proto.head_params,
                                         jax.random.PRNGKey(7))
    bb_params = proto.backbone_params

    pc.reload_tuned()   # the sidecar was (re)written just before this run
    flipped_sw = {"encoder_stack": pc.encoder_stack_default(),
                  "decoder_stack": pc.decoder_stack_default(),
                  "vit_pair_blocks": pc.vit_pair_blocks_default()}

    def run(switches: bool | None, img):
        """switches=False -> chain; None -> defaults (sidecar/env)."""
        for setter in (pc.set_encoder_stack, pc.set_decoder_stack,
                       pc.set_vit_pair_blocks):
            setter(switches)
        cfg = Config(model=mcfg, test_data=DataConfig(image_size=size))
        est = PoseEstimator(cfg, backbone_params=bb_params,
                            head_params=head_params)
        est.backbone_cfg = bb_cfg
        pred, _ = est.forward_cached(support, {"img_q": img,
                                               "group": group})
        return np.asarray(pred, np.float64) * size   # px

    try:
        chain = run(False, img_q)
        probe = run(False, img_q + 1e-3)
        flipped = run(None, img_q) + inject
    finally:
        for setter in (pc.set_encoder_stack, pc.set_decoder_stack,
                       pc.set_vit_pair_blocks):
            setter(None)

    sens = float(np.abs(chain - probe).max())
    tol = safety * sens + floor
    delta = float(np.abs(chain - flipped).max())
    ok = bool(np.isfinite(chain).all() and np.isfinite(flipped).all()
              and delta <= tol)
    print(json.dumps({"ok": ok, "max_delta_px": round(delta, 4),
                      "sens_px": round(sens, 4), "tol_px": round(tol, 4),
                      "switches": flipped_sw}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
