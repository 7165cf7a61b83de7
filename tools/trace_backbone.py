"""Trace backbone+FPN at bs=32 and dump the top ops from the perfetto trace."""
import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from omni3d_tpu.config.cfg import StaticCfg
    from omni3d_tpu.config.defaults import get_default_cfg
    from omni3d_tpu.models.rcnn3d import CubeRCNN, preprocess

    cfg = get_default_cfg()
    cfg.merge_from_file("configs/cubercnn_DLA34_FPN.yaml")
    scfg = StaticCfg(cfg)
    model = CubeRCNN(cfg=scfg, dtype=jnp.bfloat16)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rng = np.random.default_rng(0)
    imgs = preprocess(
        jnp.asarray(rng.integers(0, 255, (B, 512, 512, 3), dtype=np.int32)),
        cfg.MODEL.PIXEL_MEAN, cfg.MODEL.PIXEL_STD,
    )
    params = model.init(jax.random.PRNGKey(0), imgs[:1])

    fn = jax.jit(lambda p, x: model.apply(p, x, method=CubeRCNN.features))
    out = fn(params, imgs)
    jax.block_until_ready(out)

    trace_dir = "/tmp/bb_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = fn(params, imgs)
        jax.block_until_ready(out)
        # force sync via host transfer
        float(out["p6"].sum())

    f = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)[0]
    d = json.load(gzip.open(f))
    ev = d["traceEvents"]
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    agg, cnt = collections.Counter(), collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e.get("pid"), ""):
            agg[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    total = sum(v for k, v in agg.items() if not k.startswith("jit_"))
    print(f"B={B}: device op total {total/3e3:.2f} ms/call")
    for name, dur in agg.most_common(30):
        print(f"{dur/3e3:9.3f} ms  n={cnt[name]:3d}  {name[:100]}")


if __name__ == "__main__":
    main()
