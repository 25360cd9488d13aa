#!/usr/bin/env python3
"""Resumable counting over a BGZF corpus: write checkpoints while counting,
kill the run, resume — the final spectrum is bit-identical.

BGZF (bgzip) is the one compressed format where this works: each <=64 KiB
member records its decoded size, so a record-aligned DECOMPRESSED offset is
a seekable resume coordinate (io/bgzf.py).  Recompress plain gzip with
``needletail-tpu bgzip reads.fq.gz -o reads.fq.bgz``.

    python examples/checkpoint_resume.py [reads.fq[.bgz]]
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from needletail_tpu.device.pipeline import hash_count_file
from needletail_tpu.io.bgzf import write_bgzf
from needletail_tpu.parallel.checkpoint import load_stream_checkpoint

K = 21


def main() -> None:
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:  # demo corpus: the bench FASTQ, BGZF-recompressed
        raw = open(
            Path(__file__).parent.parent / "tests/data/PRJNA271013_head.fq",
            "rb",
        ).read()
        path = tempfile.mktemp(suffix=".fq.bgz")
        write_bgzf(raw, path)

    ck = tempfile.mktemp(suffix=".npz")

    # 1. an uninterrupted run (the ground truth)
    ref = hash_count_file(path, K, batch_size=512, max_len=None)
    print(f"uninterrupted: {ref[0]} bases, {ref[1]} windows")

    # 2. a checkpointing run — every 2 batches the driver atomically
    #    persists (table, tallies, record-aligned input offset)
    out = hash_count_file(
        path, K, batch_size=512,
        checkpoint_every=2, checkpoint_path=ck, host_workers=1,
    )
    saved = load_stream_checkpoint(ck)
    print(
        f"checkpointed run done; last checkpoint at input offset "
        f"{saved['file_offset']} ({saved['n_bases']} bases folded)"
    )
    assert np.array_equal(out[3], ref[3])

    # 3. "the job died" — resume from the checkpoint file.  The driver
    #    re-frames [offset, EOF) (for BGZF: hops to the containing block
    #    and skips into it) and folds into the restored table; integer
    #    adds commute, so the result is bit-identical.
    resumed = hash_count_file(
        path, K, batch_size=512, resume_from=ck, host_workers=1
    )
    assert resumed[:3] == ref[:3]
    assert np.array_equal(resumed[3], ref[3])
    print("resumed run matches the uninterrupted table bit-for-bit")


if __name__ == "__main__":
    main()
