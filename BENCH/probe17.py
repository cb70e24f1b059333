"""Probe #17 orchestrator — one unattended pass of the full host-gate
protocol (CLAUDE.md round-4c refinement), so an interrupted session
cannot strand a half-run:

  1. machine ceiling (md5 multiprocessing, no Spark) — require >= 3.0x
  2. sustained 13M gate at local[32], TWO runs
     (--convs 480000 --files-per-trigger 64 --check) — require two
     consecutive write stages at the isolated-pass rate (<= 7 s for
     ~3.25M-event batches; round-5 passing profile was 3.6-4.7 s)
  3. only if both hold: 10^8 soak (--convs 3700000 --check) at
     local[8] then local[32], fresh JVM each
  4. ceiling re-probe after, pair ratio + raw / ceiling-normalized
     efficiency

Writes BENCH/probe17_round5.json (always) and
BENCH/soak{8,32}_round5c_probe.json (only if the soak ran).
Progress streams to BENCH/probe17.log.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from scaling import machine_ceiling  # noqa: E402

LOG = os.path.join(HERE, "probe17.log")
GATE_WRITE_PASS_S = 7.0


def log(msg: str) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def bench(cpus: int, convs: int, files_per_trigger: int = 64) -> dict:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_DRIVER_MEM", None)
    cmd = [
        sys.executable, os.path.join(HERE, "replay_bench.py"),
        "--cpus", str(cpus), "--convs", str(convs),
        "--files-per-trigger", str(files_per_trigger), "--check",
    ]
    log(f"run: {' '.join(cmd[1:])}")
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=os.path.dirname(HERE))
    if p.returncode != 0:
        raise RuntimeError(f"replay_bench failed:\n{p.stderr[-3000:]}")
    res = json.loads(p.stdout.strip().splitlines()[-1])
    log(f"  -> {res['events_per_sec']:.1f} ev/s, "
        f"writes {[round(ph['write'], 1) for ph in res['phases']]}, "
        f"check_ok={res['check_ok']}")
    return res


def gate_writes_flat(res: dict) -> bool:
    w = [ph["write"] for ph in res["phases"]]
    return any(w[i] <= GATE_WRITE_PASS_S and w[i + 1] <= GATE_WRITE_PASS_S
               for i in range(len(w) - 1))


def main() -> int:
    out: dict = {"probe": 17, "protocol":
                 "ceiling -> 13M gate x2 (local[32]) -> soak only if flat"}
    log("ceiling probe (before)...")
    cb = machine_ceiling()
    out["ceiling_before"] = {k: round(v, 3) for k, v in cb.items()}
    log(f"  -> ratio {cb['ratio']:.3f}")
    if cb["ratio"] < 3.0:
        out["gate"] = f"FAILED at ceiling stage ({cb['ratio']:.2f}x < 3.0x)"
        out["soak"] = "skipped per gate protocol"
        _write(out)
        return 0

    runs = []
    for i in (1, 2):
        log(f"13M gate run {i} (local[32])...")
        runs.append(bench(32, 480_000))
    out["gate_run1"], out["gate_run2"] = runs
    flat = [gate_writes_flat(r) and r["check_ok"] for r in runs]
    log(f"gate flat-writes per run: {flat}")

    cm = machine_ceiling()
    out["ceiling_after_gate"] = {k: round(v, 3) for k, v in cm.items()}
    log(f"ceiling after gate: {cm['ratio']:.3f}")

    if not any(flat):
        out["gate"] = ("FAILED (no run held two consecutive write stages "
                       f"<= {GATE_WRITE_PASS_S} s)")
        out["soak"] = "skipped per gate protocol"
        _write(out)
        return 0
    out["gate"] = "PASSED"

    log("10^8 soak, local[8]...")
    s8 = bench(8, 3_700_000)
    with open(os.path.join(HERE, "soak8_round5c_probe.json"), "w") as f:
        json.dump(s8, f)
    log("10^8 soak, local[32]...")
    s32 = bench(32, 3_700_000)
    with open(os.path.join(HERE, "soak32_round5c_probe.json"), "w") as f:
        json.dump(s32, f)

    ca = machine_ceiling()
    out["ceiling_after"] = {k: round(v, 3) for k, v in ca.items()}
    ratio = s32["events_per_sec"] / s8["events_per_sec"]
    out["soak"] = {
        "local8_events_per_sec": s8["events_per_sec"],
        "local32_events_per_sec": s32["events_per_sec"],
        "ratio_8_to_32": round(ratio, 3),
        "raw_efficiency": round(ratio / 4.0, 3),
        "ceiling_normalized_efficiency": round(ratio / ca["ratio"], 3),
        "check_ok": s8["check_ok"] and s32["check_ok"],
    }
    _write(out)
    return 0


def _write(out: dict) -> None:
    path = os.path.join(HERE, "probe17_round5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")


if __name__ == "__main__":
    raise SystemExit(main())
