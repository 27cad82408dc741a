"""Per-op device-time profile of a training step.

The reference has no profiler integration (SURVEY.md §5: manual fvcore
timers + `torch.cuda.synchronize`). The TPU equivalent captures an xplane
trace of a few jitted train steps and prints the framework-op self-time
table — the workflow every perf win in this repo came from.

Usage:
    python tools/profile_step.py --cfg configs/Kinetics/MVITv2_S_16x4.yaml \
        [--batch 16] [--steps 3] [--out /tmp/xprof] \
        [--opts TPU.COMPUTE_DTYPE bfloat16 ...]

Prints the top ops by total device self-time, their HLO category, and the
measured memory bandwidth (ops near the chip's HBM bandwidth are
bandwidth-bound and already at speed of light; ops far below with large
FLOP counts are the optimization targets).
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor an explicit JAX_PLATFORMS even when a sitecustomize hook has
# prepended its own platform (profiling on the cpu backend for shape/
# pipeline debugging: JAX_PLATFORMS=cpu).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def parse_framework_op_stats(trace_dir, top_k=30):
    """xplane.pb -> rows of (op, category, self_time_us, bw_GBps)."""
    from xprof.convert.raw_to_tool_data import xspace_to_tool_data

    planes = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    )
    if not planes:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    data, _ = xspace_to_tool_data([planes[-1]], "framework_op_stats", {})
    tables = json.loads(data)
    if not isinstance(tables, list):
        tables = [tables]
    out = []
    for table in tables:  # later tables are fallbacks, not merged (dups)
        idx = {c["id"]: i for i, c in enumerate(table["cols"])}
        if "host_or_device" not in idx:
            continue
        rows = {"Device": [], "Host": []}
        for row in table["rows"]:
            c = [cell.get("v") for cell in row["c"]]
            side = c[idx["host_or_device"]]
            rows.setdefault(side, []).append(
                {
                    "op": c[idx["operation"]],
                    "category": c[idx["type"]],
                    "total_self_us": float(c[idx["total_self_time"]] or 0.0),
                    "bw_GBps": c[idx["measured_memory_bw"]],
                    "bound_by": (
                        c[idx["bound_by"]] if "bound_by" in idx else None
                    ),
                }
            )
        # CPU-backend traces report compute Host-side (Device = IDLE only).
        dev = [r for r in rows["Device"] if r["category"] != "IDLE"]
        out = dev or [r for r in rows["Host"] if r["category"] != "IDLE"]
        if out:
            break
    out.sort(key=lambda r: -r["total_self_us"])
    return out, out[:top_k]


_SCOPE_RE = None


def _scope_of(op_name):
    """Model-stage attribution from the HLO metadata path (s1/s2/.../head)."""
    import re

    global _SCOPE_RE
    if _SCOPE_RE is None:
        _SCOPE_RE = re.compile(
            r"/(s\d(?:_fuse)?|head|patch_embed|blocks?_?\d*|pathway\d+_(?:stem|pool))/"
        )
    m = _SCOPE_RE.search(op_name)
    return m.group(1) if m else "(other)"


def print_summary(all_rows, steps):
    total = sum(r["total_self_us"] for r in all_rows)
    print(f"\n== totals: {total/1e3:.1f} ms device self-time over {steps} steps "
          f"({total/steps/1e3:.2f} ms/step) ==")

    def rollup(keyfn, title):
        agg = {}
        for r in all_rows:
            k = keyfn(r)
            agg[k] = agg.get(k, 0.0) + r["total_self_us"]
        print(f"-- by {title} --")
        for k, us in sorted(agg.items(), key=lambda kv: -kv[1]):
            if us / total < 0.005:
                continue
            print(f"{us/steps/1e3:9.2f} ms/step  {100*us/total:5.1f}%  {k}")

    rollup(lambda r: r["category"], "HLO category")
    rollup(lambda r: _scope_of(r["op"]), "model scope")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/xprof_step")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--dump", default=None,
                    help="write the full op table as JSON to this path")
    ap.add_argument("--opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    import jax

    from slowfast_tpu.config import get_cfg

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _build, _sf_inputs

    cfg = get_cfg()
    cfg.merge_from_file(args.cfg)
    cfg.NUM_GPUS = 1
    if args.opts:
        cfg.merge_from_list(args.opts)
    state, step, rng = _build(cfg)
    import jax.numpy as jnp

    batch = {
        "inputs": _sf_inputs(cfg, args.batch, random=True),
        "labels": jnp.zeros((args.batch,), jnp.int32),
    }
    if cfg.DETECTION.ENABLE:
        # Mirror bench.bench_ava_detection's bucketed padded boxes +
        # multi-label targets so detection recipes profile too.
        import numpy as np

        B, max_boxes = args.batch, 8
        rs = np.random.RandomState(3)
        xy1 = rs.rand(B, max_boxes, 2).astype(np.float32) * 100
        wh = rs.rand(B, max_boxes, 2).astype(np.float32) * 100 + 4
        n_real = rs.randint(1, max_boxes + 1, (B,))
        batch["labels"] = jnp.asarray(
            (rs.rand(B, max_boxes, cfg.MODEL.NUM_CLASSES) < 0.1).astype(
                np.float32
            )
        )
        batch["boxes"] = jnp.asarray(np.concatenate([xy1, xy1 + wh], -1))
        batch["box_mask"] = jnp.asarray(
            (np.arange(max_boxes)[None] < n_real[:, None]).astype(np.float32)
        )
    if cfg.MASK.ENABLE and cfg.AUG.GEN_MASK_LOADER:
        import numpy as np

        from slowfast_tpu.data.kinetics import gen_mask

        batch["mask"] = jnp.asarray(
            np.stack([gen_mask(cfg) for _ in range(args.batch)]), jnp.float32
        )

    # Warm up (compile) outside the trace.
    state, m = step(state, batch, rng)
    float(m["loss"])  # force completion (block_until_ready is a no-op
    #                   through tunneled runtimes)

    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, m = step(state, batch, rng)
        float(m["loss"])

    try:
        all_rows, rows = parse_framework_op_stats(args.out, args.top)
    except Exception as e:  # xprof optional — leave the raw trace usable
        print(f"trace written to {args.out}; xprof parse failed: {e!r}")
        return
    total = sum(r["total_self_us"] for r in rows)
    print(f"top {len(rows)} device ops over {args.steps} steps "
          f"({total/1e3:.1f} ms listed):")
    for r in rows:
        bw = f"  {r['bw_GBps']:.0f} GB/s" if r["bw_GBps"] else ""
        bb = f" [{r['bound_by']}]" if r.get("bound_by") not in (None, "Unknown") else ""
        print(f"{r['total_self_us']/1e3:9.2f} ms  {r['category']:<22}"
              f" {r['op'][:90]}{bw}{bb}")
    print_summary(all_rows, args.steps)
    if args.dump:
        with open(args.dump, "w") as f:
            json.dump(all_rows, f)
        print(f"full table ({len(all_rows)} rows) -> {args.dump}")


if __name__ == "__main__":
    main()
