# Typed public stub for the needletail-parity binding surface
# (the TPU-native twin of the reference's needletail.pyi:1-248).
from pathlib import Path
from typing import Iterator, Optional, Tuple, Union

from .errors import NeedletailError as NeedletailError

class Record:
    """One biological sequence record with owned string fields."""

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

def normalize_seq(seq: str, iupac: bool = False) -> str:
    """Return the normalized sequence (always a new string)."""

def reverse_complement(seq: str) -> str:
    """Reverse complement (IUPAC-aware, case-preserving)."""

def decode_phred(qual: str, base_64: bool = False) -> Tuple[int, ...]:
    """Decode a quality string to Phred scores (offset 33 or 64)."""
