"""Focused 8<->32 scaling pair capture (north-rule evidence).

Runs ONLY the 8- and 32-core measurements back-to-back in one calm
host window (the full tools/scaling_run.py sweep takes long enough
that ambient load can shift between the 8- and 32-core legs, which
contaminates the ratio). Records the start load average and the
concurrently-measured pure-python multiprocessing ceiling so the
efficiency can be judged against what the oversubscribed-vCPU host
actually permits.

Usage: python tools/scaling_pair.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_run import hardware_ceiling, measure  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/scaling_pair.json"
    start_load = os.getloadavg()[0]
    r8 = measure(8)
    r32 = measure(32)
    ceiling = hardware_ceiling(8, 32)
    speedup = r32["pages_per_sec"] / r8["pages_per_sec"]
    out = {
        "start_load": round(start_load, 2),
        "runs": {"8": r8, "32": r32},
        "scaling_8_to_32": {
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / 4, 3),
            "hardware_ceiling_speedup": round(ceiling, 3),
            "efficiency_vs_hardware_ceiling": round(speedup / ceiling, 3),
        },
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
