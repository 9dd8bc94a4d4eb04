"""Device-level op profile of the north-star round (xplane capture).

Captures a jax.profiler trace around warm engine rounds on the real
bench workload (bench.py's C=100 s2d-flat configuration), then converts
the xplane with xprof's converter into an HLO-op table: the op-level
ground truth under the ablation bounds from step_tail_bench.py.

Usage:  python benchmarks/profile_round.py [logdir]
Writes  artifacts/bench/round_profile.json (top ops by self-time) and
leaves the raw xplane under the logdir for TensorBoard/xprof viewing.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def capture(logdir: str) -> str:
    import jax

    from multimodal_fl_security_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    # The SHARED workload constructor (bench.py) — the profiled program is
    # by construction the same one the driver metric measures.
    import bench

    engine, params = bench.build_engine()
    p, metrics = engine.run_round(params, jax.random.PRNGKey(0))
    float(metrics["client_loss_mean"])  # warm + hard sync
    with jax.profiler.trace(logdir):
        for r in range(2):
            p, metrics = engine.run_round(p, jax.random.PRNGKey(r + 1))
        float(metrics["client_loss_mean"])
    paths = sorted(glob.glob(
        os.path.join(logdir, "plugins", "profile", "*", "*.xplane.pb")))
    if not paths:
        raise RuntimeError(f"no xplane captured under {logdir}")
    return paths[-1]


def op_table(xplane_path: str):
    """Convert the xplane into (tool, parsed-json) op tables via xprof."""
    try:
        # Import inside the guarded region: a missing/broken xprof must
        # not crash AFTER the expensive TPU capture — the raw xplane path
        # plus the error still get recorded in the artifact.
        from xprof.convert import raw_to_tool_data as rtd
    except Exception as e:
        return {"error": f"xprof unavailable: {type(e).__name__}: {e}"}

    out = {}
    for tool in ("hlo_stats", "framework_op_stats"):
        try:
            data = rtd.xspace_to_tool_data([xplane_path], tool, {})
            if isinstance(data, tuple):
                data = data[0]
            if isinstance(data, bytes):
                data = data.decode("utf-8", "replace")
            out[tool] = json.loads(data)
        except Exception as e:  # record what this toolchain can't do
            out[tool] = {"error": f"{type(e).__name__}: {e}"}
    return out


def summarize(tables) -> dict:
    """Top ops by self-time from whichever tool parsed (gviz table JSON)."""

    def rows_of(t):
        # gviz DataTable: {"cols": [{label/id}...], "rows": [{"c": [{"v":..}]}]}
        if isinstance(t, dict) and "rows" in t and "cols" in t:
            cols = [c.get("label") or c.get("id") for c in t["cols"]]
            return [dict(zip(cols, [c.get("v") if isinstance(c, dict) else c
                                    for c in (r.get("c") or [])]))
                    for r in t["rows"]]
        return None

    for tool in ("hlo_stats", "framework_op_stats"):
        t = tables.get(tool)
        if isinstance(t, list):  # some versions emit [table, ...]
            t = t[0] if t else None
        rows = rows_of(t)
        if not rows:
            continue
        timekeys = [k for k in rows[0]
                    if k and "time" in k.lower() and "self" in k.lower()]
        if not timekeys:
            continue
        tk = timekeys[0]
        namekeys = [k for k in rows[0] if k and "name" in k.lower()]
        catkeys = [k for k in rows[0] if k and "categor" in k.lower()]
        def tval(r):
            try:
                return float(r.get(tk) or 0)
            except (TypeError, ValueError):
                return 0.0

        rows.sort(key=lambda r: -tval(r))
        top = [{"op": r.get(namekeys[0]) if namekeys else "?",
                "category": r.get(catkeys[0]) if catkeys else "?",
                tk: r.get(tk)} for r in rows[:25]]
        by_cat = {}
        for r in rows:
            c = (r.get(catkeys[0]) if catkeys else "?") or "?"
            by_cat[c] = by_cat.get(c, 0.0) + tval(r)
        return {"tool": tool, "self_time_key": tk, "top_ops": top,
                "by_category": dict(sorted(by_cat.items(),
                                           key=lambda kv: -kv[1]))}
    return {"error": "no parsable op table", "tools": list(tables)}


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mft_profile"
    xp = capture(logdir)
    print("captured:", xp)
    tables = op_table(xp)
    if "error" in tables and len(tables) == 1:
        summary = {"xplane": xp, **tables}
    else:
        summary = dict(summarize(tables), xplane=xp)
    out = os.path.join(REPO, "artifacts", "bench", "round_profile.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2)[:4000])
    print("wrote", out)


if __name__ == "__main__":
    main()
