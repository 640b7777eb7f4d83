"""Generate the multi-chunk XXL scaling table.

The round-4/5 single-call XL table (456,995 convs, 12.6M turns) gives
8 pinned cores only ~30s of parallel work each against a roughly
constant ~18s of per-action fixed cost (Catalyst planning + job
scheduling for the 5-branch union), so the 2->8 pairing measures the
fixed cost, not the engine (Amdahl fit from the r5 interleaved series:
T(N) ~= 18s + 253s/N). At the 10^12-turn target scale that fixed cost
is noise; a 3x table (~37.8M turns) restores a regime where the
parallel work dominates at 8 cores while keeping the 2-core leg under
~7 minutes.

Chunked generation (``GenSpec.conv_offset`` exists for exactly this)
also writes MULTIPLE parquet files, so the scan parallelizes without
relying on row-group splitting (CLAUDE.md rule 16).

Usage: python scripts/gen_scaling_table.py [n_chunks] [convs_per_chunk]
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from ecov003_l2t_stars_spark.sources.transcripts import (  # noqa: E402
    GenSpec,
    write_transcripts_parquet,
)


def main() -> None:
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    convs = int(sys.argv[2]) if len(sys.argv) > 2 else 456_995
    out = REPO / ".bench_cache" / "transcripts_scaling_xxl.parquet"
    # clean regeneration: stale chunk files from a previous run with
    # more chunks (or a crashed run) would silently inflate the table
    # the scaling worker reads; a plain file at the path would make
    # mkdir raise (r5 ADVICE)
    if out.exists():
        if out.is_dir():
            shutil.rmtree(out)
        else:
            out.unlink()
    out.mkdir(parents=True)
    total = 0
    for i in range(n_chunks):
        t0 = time.perf_counter()
        spec = GenSpec(n_convs=convs, seed=42 + i, conv_offset=i * 1_000_000)
        n = write_transcripts_parquet(str(out / f"chunk{i}.parquet"), spec)
        total += n
        print(
            f"chunk{i}: {n:,} turns in {time.perf_counter() - t0:.1f}s",
            flush=True,
        )
    print(f"total {total:,} turns -> {out}")


if __name__ == "__main__":
    main()
