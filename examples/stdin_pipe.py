#!/usr/bin/env python3
"""stdin -> base + canonical-AAAA-4-mer counting pipeline.

The reference's example binary (ref examples/stdin_pipe.rs): reads FASTA/FASTQ
from stdin (any supported compression), prints total bases and the number of
canonical AAAA 4-mers.

    printf '>id1\\nAGTCGTCA' | python examples/stdin_pipe.py
    There are 8 bases in your file.
    There are 0 AAAAs in your file.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from needletail_tpu import parse_fastx_stdin, sequence
from needletail_tpu.kmer import canonical_kmers


def main() -> None:
    n_bases = 0
    n_valid_kmers = 0
    reader = parse_fastx_stdin()
    while (record := reader.next()) is not None:
        n_bases += record.num_bases()
        norm_seq = record.normalize(False)
        rc = sequence.reverse_complement(norm_seq)
        for (_, kmer, _) in canonical_kmers(norm_seq, rc, 4):
            if kmer == b"AAAA":
                n_valid_kmers += 1
    print(f"There are {n_bases} bases in your file.")
    print(f"There are {n_valid_kmers} AAAAs in your file.")


if __name__ == "__main__":
    main()
