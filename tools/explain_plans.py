"""Print physical plans for the headline queries (PLANS.md evidence).

Usage: python tools/explain_plans.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from opentelemetry_collector_contrib_spark.session import get_spark

DEFAULT = [
    "filter_processor", "count_connector", "log_dedup", "tail_sampler",
    "enrich_chained", "recombine", "ngram_jaccard", "minhash_lsh",
    "token_count", "cosine_top1",
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(
        master="local[4]", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs = entrymod.queries()
    for name in names:
        print(f"\n{'=' * 70}\n## {name}\n{'=' * 70}")
        qs[name](spark, "/root/testdata/sf0.001").explain("formatted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
