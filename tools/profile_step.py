"""Profile one model's train step on the attached TPU and print an op-level
cost breakdown (framework_op_stats via xprof).

The reference has no profiler integration (SURVEY.md §5); this is the
TPU-native equivalent of its manual timer triplets: capture a
jax.profiler trace around N hot steps and reduce the xplane to per-op
self-time, grouped by op category and by source line.

Usage:
    python tools/profile_step.py configs/Kinetics/MVITv2_S_16x4.yaml [B]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cfg_path = sys.argv[1]
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from bench import _build, _sf_inputs, _sync
    from slowfast_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file(cfg_path)
    cfg.NUM_GPUS = 1
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    if os.environ.get("PROFILE_NO_MIXUP"):
        cfg.MIXUP.ENABLE = False
    state, step, rng = _build(cfg)
    batch = {
        "inputs": _sf_inputs(cfg, B, random=True),
        "labels": jax.random.randint(
            jax.random.PRNGKey(2), (B,), 0, cfg.MODEL.NUM_CLASSES
        ),
    }
    t0 = time.time()
    for _ in range(3):
        state, m = step(state, batch, rng)
    _sync(m)
    print(f"compiled+warm in {time.time()-t0:.0f}s", file=sys.stderr)
    t0 = time.time()
    for _ in range(10):
        state, m = step(state, batch, rng)
    _sync(m)
    dt = time.time() - t0
    print(f"rate: {10*B/dt:.2f} clips/s ({dt/10*1000:.1f} ms/step)")

    logdir = os.environ.get("PROFILE_DIR", "/tmp/xprof_trace")
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        state, m = step(state, batch, rng)
    _sync(m)
    jax.profiler.stop_trace()
    report(logdir)


def report(logdir, top=45):
    import glob

    xs = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not xs:
        print("no xplane captured", file=sys.stderr)
        return
    from xprof.convert import raw_to_tool_data as rtd

    params = {"tqx": "out:csv;"}
    csv_data, _ = rtd.xspace_to_tool_data([xs[-1]], "framework_op_stats", params)
    if isinstance(csv_data, bytes):
        csv_data = csv_data.decode()
    import csv as csvmod
    import io

    rows = list(csvmod.DictReader(io.StringIO(csv_data)))
    if not rows:
        print(csv_data[:2000])
        return
    cols = rows[0].keys()
    print("columns:", list(cols), file=sys.stderr)

    def f(r, *names, default=0.0):
        for n in names:
            if n in r and r[n] not in ("", None):
                try:
                    return float(r[n])
                except ValueError:
                    pass
        return default

    device_rows = [
        r for r in rows if "device" in (r.get("host_or_device") or "").lower()
        or "Device" in (r.get("host_or_device") or "")
    ] or rows
    key_time = None
    for cand in ("total_self_time_in_us", "self_time_us", "total_self_time",
                 "avg_self_time_in_us"):
        if cand in cols:
            key_time = cand
            break
    device_rows.sort(key=lambda r: -f(r, key_time))
    tot = sum(f(r, key_time) for r in device_rows)
    print(f"\n== framework_op_stats (device, total {tot/1e3:.1f} ms) ==")
    for r in device_rows[:top]:
        t = f(r, key_time)
        print(
            f"{t/1e3:9.2f}ms {100*t/max(tot,1e-9):5.1f}%  "
            f"{(r.get('category') or r.get('type') or ''):<22.22} "
            f"{(r.get('operation') or r.get('op_name') or ''):<60.60} "
            f"occ={r.get('occurrences','')}"
        )
    # Category rollup
    agg = {}
    for r in device_rows:
        c = r.get("category") or r.get("type") or "?"
        agg[c] = agg.get(c, 0.0) + f(r, key_time)
    print("\n== by category ==")
    for c, t in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{t/1e3:9.2f}ms {100*t/max(tot,1e-9):5.1f}%  {c}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--report":
        report(sys.argv[2])
    else:
        main()
