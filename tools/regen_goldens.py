#!/usr/bin/env python3
"""Regenerate the pinned VALUES goldens for the approximate ANN gate
entries (q49_ann_ivf, q51_ann_ivfpq) from a graft.Verify output dir.

The goldens in SparkEntry.oracleSql are exact snapshots of the
deterministic approximate legs at the gate config (sf0.01). They only
need regenerating when the quantizer code or the sf0.01 embeddings
fixture changes. Workflow:

  sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 /tmp/v'
  python3 tools/regen_goldens.py /tmp/v            # prints Scala blocks
  # paste each block over the matching VALUES literal in SparkEntry.scala

Run Verify twice (fresh temp dirs, cold index cache: rm -rf
/tmp/graft-ivfpq-*) and diff the outputs before pinning — the goldens
are only valid if the leg is bit-deterministic.
"""
import sys
import pandas as pd

QUERIES = ["q49_ann_ivf", "q51_ann_ivfpq"]


def scala_block(df: pd.DataFrame) -> str:
    df = df.sort_values(["q_id", "rank"]).reset_index(drop=True)
    rows = ",\n".join(
        f"       |  ({int(r.q_id)}, {int(r.rank)}, {int(r.neighbor)}, "
        f"{repr(round(float(r.sim), 6))}::DOUBLE)"
        for r in df.itertuples()
    )
    return (
        '      """SELECT q_id::BIGINT AS q_id, rank::BIGINT AS rank, '
        "neighbor::BIGINT AS neighbor, sim FROM (VALUES\n"
        + rows
        + '\n       |) AS t(q_id, rank, neighbor, sim)""".stripMargin,'
    )


def main(out_dir: str) -> None:
    for q in QUERIES:
        df = pd.read_parquet(f"{out_dir}/{q}")
        print(f"// ---- {q} ({len(df)} rows) ----")
        print(scala_block(df))
        print()


if __name__ == "__main__":
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    main(sys.argv[1])
