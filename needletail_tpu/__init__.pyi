# Typed public stub for the needletail_tpu package root — the TPU-native
# twin of the reference's full-module stub (ref needletail.pyi:1-248).
#
# The root surface is the needletail-parity API (parse_fastx_*, Record,
# FastxReader, normalize_seq, reverse_complement, decode_phred,
# NeedletailError) plus the error taxonomy and the host sequence-op
# modules.  The TPU-native layers (needletail_tpu.batch / io / device /
# parallel) ship inline annotations under ``py.typed`` and are checked by
# the CI typecheck job; this stub pins the compatibility surface exactly.

from pathlib import Path
from typing import BinaryIO, Iterator, Optional, Tuple, Union

from . import bitkmer as bitkmer
from . import errors as errors
from . import kmer as kmer
from . import quality as quality
from . import sequence as sequence
from .errors import NeedletailError as NeedletailError
from .errors import ParseError as ParseError
from .errors import ParseErrorKind as ParseErrorKind
from .errors import PhredOffsetError as PhredOffsetError

__version__: str

class Record:
    """One biological sequence record with owned string fields (the
    reference's python.rs:126-264 semantics: lossy-UTF-8 copies, equality
    and hashing over (id, seq, qual))."""

    id: str
    seq: str
    qual: Optional[str]

    def __init__(self, id: str, seq: str, qual: Optional[str] = None) -> None: ...
    @property
    def name(self) -> str:
        """``id`` up to the first whitespace character."""

    @property
    def description(self) -> Optional[str]:
        """``id`` after the first whitespace, lstripped; None if absent."""

    def is_fasta(self) -> bool: ...
    def is_fastq(self) -> bool: ...
    def normalize(self, iupac: bool = False) -> None:
        """Normalize ``seq`` in place (case-fold, U->T, IUPAC handling)."""

    def __hash__(self) -> int: ...
    def __eq__(self, other: object) -> bool: ...
    def __len__(self) -> int: ...
    def __str__(self) -> str: ...
    def __repr__(self) -> str: ...

class FastxReader:
    """Iterator over :class:`Record` from one FASTA/FASTQ stream."""

    def __iter__(self) -> Iterator[Record]: ...
    def __next__(self) -> Record: ...
    def __repr__(self) -> str: ...

def parse_fastx_file(path: Union[str, Path]) -> FastxReader:
    """Open a (possibly gz/bz2/xz/zstd-compressed) FASTX file."""

def parse_fastx_string(content: str) -> FastxReader:
    """Parse FASTA/FASTQ records from a string."""

def parse_fastx_reader(reader: BinaryIO) -> "parser.FastxReader":
    """Sniff + parse records from any binary stream (parser-level reader
    yielding zero-copy ``SequenceRecord`` views, not owned ``Record``s)."""

def parse_fastx_stdin() -> "parser.FastxReader":
    """Sniff + parse records from standard input."""

def normalize_seq(seq: str, iupac: bool = False) -> str:
    """Return the normalized sequence (always a new string)."""

def reverse_complement(seq: str) -> str:
    """Reverse complement (IUPAC-aware, case-preserving)."""

def decode_phred(qual: str, base_64: bool = False) -> Tuple[int, ...]:
    """Decode a quality string to Phred scores (offset 33 or 64)."""

class Sequence(bytes):
    """Sequence-trait parity facade: ``bytes`` subclass with the
    reference trait methods (ref sequence.rs:156-253), chainable."""

    def sequence(self) -> bytes: ...
    def strip_returns(self) -> "Sequence": ...
    def normalize(self, iupac: bool = False) -> "Sequence": ...
    def reverse_complement(self) -> "Sequence": ...
    def canonical(self) -> "Sequence": ...
    def minimizer(self, length: int) -> "Sequence": ...
    def kmers(self, k: int) -> Iterator[bytes]: ...
    def canonical_kmers(
        self, k: int, reverse_complement: bytes
    ) -> Iterator[Tuple[int, bytes, bool]]: ...
    def bit_kmers(
        self, k: int, canonical: bool = False
    ) -> Iterator[Tuple[int, Tuple[int, int], bool]]: ...
    def quality_mask(self, qual: bytes, score: int) -> "Sequence": ...

from . import parser as parser

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
