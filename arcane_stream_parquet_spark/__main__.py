"""CLI entry point — the reference's run contract (main.scala:135-144):

    STREAMCONTEXT__SPEC='{...}' \\
    STREAMCONTEXT__BACKFILL=false \\
    python -m arcane_stream_parquet_spark --warehouse ./warehouse \\
        --checkpoints ./checkpoints

Exit codes (ST7, main.scala:80-83): 0 clean stop, 2 retryable
(StreamFailError — k8s podFailurePolicy retries without counting),
1 anything else.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    from arcane_stream_parquet_spark.config import (
        load_stream_context,
        main_exit_code,
        run_stream_context,
    )
    from arcane_stream_parquet_spark.session import build_session

    parser = argparse.ArgumentParser(prog="arcane_stream_parquet_spark")
    parser.add_argument("--warehouse", required=True)
    parser.add_argument("--checkpoints", required=True)
    parser.add_argument(
        "--available-now",
        action="store_true",
        help="drain what exists, then stop (test/one-shot mode)",
    )
    args = parser.parse_args(argv)

    def run() -> None:
        ctx = load_stream_context()
        spark = build_session(app_name=f"asp-{ctx.stream_id or 'stream'}")
        run_stream_context(
            spark,
            ctx,
            warehouse_root=args.warehouse,
            checkpoint_root=args.checkpoints,
            available_now=args.available_now,
        )

    return main_exit_code(run)


if __name__ == "__main__":
    sys.exit(main())
