"""Per-block profile of the DLA34+FPN backbone on the real chip.

PROFILE_r04 showed backbone+FPN at 21.6 ms (bs=32, 512px, bf16) against a
13.4 ms whole-stage roofline with no attribution of the 8 ms gap. This
tool times each block IN ISOLATION (stem chain, each DLA tree level, FPN,
p6 pool) by rebuilding the standalone submodule with the same parameters
and feeding it the captured intermediate input — no subtraction chains, so
per-block noise does not compound. The same scan/RTT methodology as
profile_stages.py.

Per-block FLOPs come from XLA cost analysis of each isolated block, giving
a roofline verdict per block (compute-bound at 197 TFLOP/s bf16 peak vs
HBM-bound at ~819 GB/s).

Usage: python tools/profile_backbone.py [B] [out.json]
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from tools.profile_stages import timed, flops_of  # noqa: E402

PEAK_TFLOPS = 197.0
HBM_GBPS = 819.0


def main():
    import jax
    import jax.numpy as jnp

    from omni3d_tpu.config.cfg import StaticCfg
    from omni3d_tpu.config.defaults import get_default_cfg
    from omni3d_tpu.models.dla import Tree, DLA_SPECS
    from omni3d_tpu.models.layers import ConvBN, max_pool
    from omni3d_tpu.models.fpn import FPN
    from omni3d_tpu.models.rcnn3d import CubeRCNN, preprocess

    cfg = get_default_cfg()
    cfg.merge_from_file("configs/cubercnn_DLA34_FPN.yaml")
    scfg = StaticCfg(cfg)
    model = CubeRCNN(cfg=scfg, dtype=jnp.bfloat16)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    H = W = 512
    rng = np.random.default_rng(0)
    imgs = preprocess(
        jnp.asarray(rng.integers(0, 255, (B, H, W, 3), dtype=np.int32)),
        cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD,
    )
    variables = model.init(jax.random.PRNGKey(0), imgs[:1])
    print(f"B={B} backend={jax.default_backend()}", file=sys.stderr)

    # ---- capture intermediate activations (inputs of each block) ----
    feats_fn = jax.jit(lambda v, x: model.apply(
        v, x, method=CubeRCNN.features, capture_intermediates=True,
        mutable=["intermediates"]))
    (_, inter) = feats_fn(variables, imgs)
    inter = inter["intermediates"]["backbone"]

    def out_of(name):
        return inter[name]["__call__"][0]

    bb_params = variables["params"]["backbone"]
    bb_stats = variables.get("batch_stats", {}).get("backbone", {})

    def subvars(name):
        v = {"params": bb_params[name]}
        if name in bb_stats:
            v["batch_stats"] = bb_stats[name]
        return v

    levels, channels, block = DLA_SPECS["dla34"]
    t = dict(train=False, dtype=jnp.bfloat16)

    results = []

    def _bytes_of(fn, args):
        """HBM traffic floor: input + output activation bytes (weights and
        intermediates excluded — a lower bound for the memory roofline)."""
        import jax as _j
        n = sum(np.prod(l.shape) * l.dtype.itemsize
                for l in _j.tree.leaves(args))
        try:
            out = _j.eval_shape(fn, *args)
            n += sum(np.prod(l.shape) * np.dtype(l.dtype).itemsize
                     for l in _j.tree.leaves(out))
        except Exception:
            pass
        return float(n)

    def rec(name, fn, args, flops=None):
        ms = timed(fn, args) * 1e3
        fl = flops_of(fn, args) if flops is None else flops
        bytes_est = _bytes_of(fn, args)
        roof_c = fl / PEAK_TFLOPS / 1e9 if fl else 0.0     # ms
        roof_m = bytes_est / HBM_GBPS / 1e6                # ms
        limit = "MXU" if roof_c >= roof_m else "HBM"
        roof = max(roof_c, roof_m)
        results.append({
            "block": name, "ms": ms, "gflop": fl / 1e9 if fl else 0.0,
            "io_bytes_est": bytes_est,
            "roofline_ms": roof, "roofline_limit": limit,
            "pct_of_roofline": roof / ms * 100 if ms > 0 else None,
        })
        print(f"{name:<18}: {ms:7.2f} ms   {fl/1e9:8.1f} GFLOP  "
              f"roof {roof:5.2f} ms ({limit}) -> {roof/ms*100 if ms>0 else 0:5.1f}%",
              flush=True)
        return ms

    # ---- whole backbone+FPN reference ----
    whole_fn = lambda v, x: model.apply(v, x, method=CubeRCNN.features)
    whole = rec("backbone+FPN", whole_fn, (variables, imgs))

    # ---- stem: base_layer + level0 + level1 (packed s2d chain) ----
    import flax.linen as nn

    class StemM(nn.Module):
        @nn.compact
        def __call__(self, x):
            packed = True
            x = ConvBN(channels[0], 7, 1, s2d=4, out_packed=packed, **t,
                       name="base_layer")(x)
            x = ConvBN(channels[0], 3, 1, s2d=4, in_packed=packed,
                       out_packed=packed, **t, name="level0")(x)
            x = ConvBN(channels[1], 3, 2, s2d=4, in_packed=packed,
                       out_packed=packed, **t, name="level1")(x)
            return x

    stem_vars = {"params": {k: bb_params[k] for k in
                            ("base_layer", "level0", "level1")}}
    if bb_stats:
        stem_vars["batch_stats"] = {k: bb_stats[k] for k in
                                    ("base_layer", "level0", "level1")
                                    if k in bb_stats}
    stem = StemM()
    rec("stem (s2d chain)", lambda v, x: stem.apply(v, x), (stem_vars, imgs))
    l1_out = out_of("level1")

    # ---- tree levels ----
    tree_cfgs = {
        "level2": dict(levels=levels[2], block=block, in_ch=channels[1],
                       out_ch=channels[2], stride=2, in_packed=2),
        "level3": dict(levels=levels[3], block=block, in_ch=channels[2],
                       out_ch=channels[3], stride=2, level_root=True),
        "level4": dict(levels=levels[4], block=block, in_ch=channels[3],
                       out_ch=channels[4], stride=2, level_root=True),
        "level5": dict(levels=levels[5], block=block, in_ch=channels[4],
                       out_ch=channels[5], stride=2, level_root=True),
    }
    ins = {"level2": l1_out, "level3": out_of("level2"),
           "level4": out_of("level3"), "level5": out_of("level4")}
    for name, kw in tree_cfgs.items():
        levels_n = kw.pop("levels")
        blk = kw.pop("block")
        in_ch = kw.pop("in_ch")
        out_ch = kw.pop("out_ch")
        stride = kw.pop("stride")
        tree = Tree(levels_n, blk, in_ch, out_ch, stride, **kw, **t,
                    name=None)
        rec(name, lambda v, x, tree=tree: tree.apply(v, x),
            (subvars(name), ins[name]))

    # ---- FPN ----
    bottom_up = {"p2": out_of("level2"), "p3": out_of("level3"),
                 "p4": out_of("level4"), "p5": out_of("level5"),
                 "p6": max_pool(out_of("level5"), 1, 2)}
    fpn = FPN(in_features=tuple(cfg.MODEL.FPN.IN_FEATURES),
              out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
              fuse_type=cfg.MODEL.FPN.FUSE_TYPE, dtype=jnp.bfloat16)
    fpn_vars = {"params": variables["params"]["fpn"]}
    rec("FPN", lambda v, d: fpn.apply(v, d), (fpn_vars, bottom_up))

    # p6 pool is a relayout-only op
    rec("p6 maxpool", lambda x: max_pool(x, 1, 2), (out_of("level5"),))

    block_sum = sum(r["ms"] for r in results[1:])
    print(f"{'sum of blocks':<18}: {block_sum:7.2f} ms   "
          f"(whole measured {whole:.2f} ms, "
          f"gap {whole - block_sum:+.2f} ms = inter-block fusion/dispatch)")

    if len(sys.argv) > 2:
        out = {
            "batch": B, "image_hw": [H, W],
            "device_kind": jax.devices()[0].device_kind,
            "blocks": results,
            "sum_of_blocks_ms": block_sum,
            "whole_ms": whole,
            "peak_tflops_assumed": PEAK_TFLOPS,
            "hbm_gbps_assumed": HBM_GBPS,
        }
        with open(sys.argv[2], "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {sys.argv[2]}", file=sys.stderr)


if __name__ == "__main__":
    main()
