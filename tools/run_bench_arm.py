"""One full-bench leg (fresh JVM, headline loop only) with the minhash
band-table persist forced to one arm — the r13 driver-conditions A/B the
r12 VERDICT asked for (ask #1): the r12 keep-decision came from a lone
single-session query A/B, while the driver's regression showed up only
inside the FULL bench sequence at local[32]. Each invocation of this
script is one leg of that sequence; alternate arms across invocations.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      python tools/run_bench_arm.py {persist|nopersist|gate}

- ``persist``   — band table always persisted (the r12 shipped shape);
- ``nopersist`` — never persisted (recompute; runtime exchange reuse may
  still dedupe the identical signature subtree);
- ``gate``      — whatever the committed size gate decides (HEAD).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_SKIP_PROBES", "1")


def main() -> None:
    arm = sys.argv[1] if len(sys.argv) > 1 else "gate"
    from nhl_data_pipeline_spark.plans import q_text

    if arm == "persist":
        q_text._MINHASH_PERSIST_MIN_DOCS = -1
    elif arm == "nopersist":
        q_text._MINHASH_PERSIST_MIN_DOCS = 1 << 60
    elif arm != "gate":
        raise SystemExit(f"unknown arm {arm!r}")
    print(f'{{"probe": "bench_arm", "minhash_persist_arm": "{arm}"}}')

    import bench

    bench.main()


if __name__ == "__main__":
    main()
