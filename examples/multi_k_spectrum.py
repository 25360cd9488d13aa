"""Single-pass multi-k counting + BGZF-parallel ingest, end to end.

    python examples/multi_k_spectrum.py reads.fq --ks 4,9,21,31

One pass over the file produces every k's exact spectrum (the 2-bit
encode runs once per batch; XLA CSEs the shared shift-ladder prefixes
across k — a 5-k pass costs ~2.3x a 1-k pass on chip, not 5x).
Compressed input decodes block-parallel when it is BGZF (make one with
``needletail-tpu bgzip``); monolithic gzip/bzip2/xz/zstd spill through
their decoder once and then range-split across framing workers.
"""

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--ks", default="4,9,21,31")
    ap.add_argument("--batch-size", type=int, default=4096)
    args = ap.parse_args()

    from needletail_tpu.device.pipeline import multi_k_count_file

    ks = tuple(int(x) for x in args.ks.split(","))
    t0 = time.perf_counter()
    n_bases, spectra = multi_k_count_file(
        args.path, ks, batch_size=args.batch_size, sparse_format="arrays"
    )
    elapsed = time.perf_counter() - t0
    print(f"{n_bases} bases, {len(ks)} k values in one pass ({elapsed:.2f}s)")
    for k in ks:
        spec = spectra[k]
        if isinstance(spec, tuple):
            keys, counts = spec
            print(f"  k={k}: {int(counts.sum())} k-mers, {len(keys)} distinct")
        else:
            print(f"  k={k}: {int(spec.sum())} k-mers, {int((spec > 0).sum())} distinct")


if __name__ == "__main__":
    main()
