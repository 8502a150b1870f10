#!/usr/bin/env python
"""One-shot wrapper for resuming the sf100 generation with hardened RPC
settings. Two sf100 generation attempts died ~3.5 min into the orders
crossJoin-write with "SparkContext was shut down" and RPC endpoint-not-
found noise but NO OutOfMemoryError and no kernel OOM kill — the local-
mode failure signature of heartbeat expiry under full-core saturation
(driver RPC threads starved long enough that HeartbeatReceiver expires
the only executor, which in local mode stops the context). The sf10 run
survived only because its stages are ~10x shorter. This wrapper creates
the session FIRST with a long network timeout + heartbeat interval and
a few cores left free for the RPC threads, then hands control to
gen_scale_data.main(), whose get_spark().getOrCreate() picks up the
existing session.

Usage: python scripts/gen_sf100_resume.py OUT_DIR TABLES
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from assignment_2_dataengineering_spark.session import get_spark  # noqa: E402

out_dir = sys.argv[1]
tables = sys.argv[2]

spark = get_spark(
    app_name="gen-sf100-resume",
    master="local[24]",
    extra_conf={
        "spark.network.timeout": "800s",
        "spark.executor.heartbeatInterval": "60s",
        "spark.rpc.askTimeout": "800s",
    },
)

from scripts import gen_scale_data  # noqa: E402

sys.argv = ["gen_scale_data.py", "100", out_dir, "heaps", tables]
gen_scale_data.main()
