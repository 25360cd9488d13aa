"""needletail_tpu — a TPU-native FASTX ingest and k-mer engine.

A from-scratch framework with the capabilities of onecodex/needletail
(FASTA/FASTQ streaming parsing, sequence normalization, reverse complement,
canonical k-mers, 2-bit packed k-mers, Phred quality handling), re-designed
TPU-first: a host-side streaming framer feeds fixed-shape padded base
tensors to JAX/Pallas device kernels, and k-mer counting runs as sharded
scatter-add tables merged with collectives on a ``jax.sharding.Mesh``.

Layered API:
  * ``needletail_tpu`` (this module)  — needletail-compatible surface:
    ``parse_fastx_file``/``parse_fastx_string``/``parse_fastx_reader``,
    ``Record``, ``FastxReader``, ``normalize_seq``, ``reverse_complement``,
    ``decode_phred``, ``NeedletailError``.
  * ``needletail_tpu.parser``         — streaming framers + SequenceRecord.
  * ``needletail_tpu.sequence/kmer/bitkmer/quality`` — host sequence ops.
  * ``needletail_tpu.batch``          — padded batch ingestion for devices.
  * ``needletail_tpu.device``         — JAX/Pallas kernels (normalize, rc,
    quality-mask, 2-bit encode, canonical k-mers, count tables).
  * ``needletail_tpu.parallel``       — mesh/sharding + collective merges.
"""

from . import bitkmer, errors, kmer, quality, sequence
from .api import (
    FastxReader,
    NeedletailError,
    Record,
    decode_phred,
    normalize_seq,
    parse_fastx_file,
    parse_fastx_string,
    reverse_complement,
)
from .errors import ParseError, ParseErrorKind, PhredOffsetError
from .seq_wrapper import Sequence
from .parser import parse_fastx_reader, parse_fastx_stdin

__version__ = "0.1.0"

__all__ = [
    "parse_fastx_file",
    "parse_fastx_string",
    "parse_fastx_reader",
    "parse_fastx_stdin",
    "Record",
    "FastxReader",
    "NeedletailError",
    "normalize_seq",
    "reverse_complement",
    "decode_phred",
    "ParseError",
    "ParseErrorKind",
    "PhredOffsetError",
    "Sequence",
    "errors",
    "sequence",
    "kmer",
    "bitkmer",
    "quality",
]
