"""Sequence-slice operators — the FASTA random-access analog (S10/T15/T16).

The reference slices genome assemblies with a local pyfaidx index
(src/etl/helpers/assembly_sequence_helper.py:37-73) and pads variant
flanks with per-row Python (src/etl/variation_etl.py:300-330); protein
translation walks CDS rows in a nested Python loop
(src/etl/protein_sequence_etl.py:80-212). None of that distributes: the
index lives on one box and the slices are row-at-a-time.

Spark-first re-expression: a contig is stored as fixed-width CHUNKS
``(contig, chunk_idx, chunk)`` — a table that partitions, prunes, and
scales to genomes (or any long-sequence corpus) of arbitrary size. A
slice request ``(contig, start, end)`` (1-based, inclusive) becomes:

  explode the chunk-index RANGE the interval covers  ->  equi-join on
  (contig, chunk_idx)  ->  per-chunk substring of the overlap  ->
  groupBy interval, ordered reassembly (array_sort on chunk_idx +
  array_join)

i.e. a range join expressed as an equi-join on a coarse bucket — the
same trick the engine's as-of join and the lake's bucket layout use.
Everything is Column expressions (whole-stage codegen); only codon
translation drops to a vectorized pandas UDF (T16's translate analog).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def chunk_contigs(
    contigs: DataFrame,
    chunk_size: int = 64,
    id_col: str = "contig",
    seq_col: str = "seq",
) -> DataFrame:
    """Explode long sequences into fixed-width chunks:
    (contig, chunk_idx, chunk) with chunk_idx 0-based; the last chunk may
    be short. This is the storage layout — write it bucketed by contig
    and the slice join below prunes to the touched chunks only."""
    n_chunks = F.ceil(F.length(F.col(seq_col)) / F.lit(chunk_size)).cast("int")
    # guard: an empty/null sequence has no chunks — sequence(0, -1) would
    # auto-step DOWNWARD and emit spurious chunk_idx [0, -1] rows
    idx = F.when(
        n_chunks >= 1, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    return contigs.select(
        F.col(id_col).alias("contig"),
        F.posexplode(
            F.transform(
                idx,
                lambda i: F.col(seq_col).substr(
                    (i * chunk_size + 1).cast("int"), F.lit(chunk_size)
                ),
            )
        ).alias("chunk_idx", "chunk"),
    )


def slice_intervals(
    chunks: DataFrame,
    intervals: DataFrame,
    chunk_size: int = 64,
    contig_col: str = "contig",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Random-access slices over the chunk table.

    ``intervals``: (interval_id, contig, start, end), 1-based inclusive,
    clamped at 1 by the caller (the reference clamps flank padding the
    same way, src/etl/variation_etl.py:311-314).
    Returns (interval_id, contig, start, end, seq).

    The join key is (contig, covered chunk_idx) — an interval of length
    L explodes into ceil(L/chunk_size)+1 rows, so the shuffle is
    O(slices * L / chunk_size), never O(genome).
    """
    lo = F.floor((F.col(start_col) - 1) / chunk_size)
    hi = F.floor((F.col(end_col) - 1) / chunk_size)
    # guard: an inverted interval (end < start) covers no chunks — a
    # descending sequence() would explode spurious rows instead of none
    covered = F.when(
        hi >= lo, F.sequence(lo.cast("int"), hi.cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    wanted = intervals.select(
        "interval_id",
        F.col(contig_col).alias("contig"),
        F.col(start_col).alias("__start"),
        F.col(end_col).alias("__end"),
        F.explode(covered).alias("chunk_idx"),
    )
    joined = wanted.join(chunks, on=["contig", "chunk_idx"])
    # overlap of [start, end] with this chunk's [cs*idx+1, cs*(idx+1)]
    chunk_lo = F.col("chunk_idx") * chunk_size + 1
    cut_from = F.greatest(F.col("__start"), chunk_lo) - chunk_lo + 1
    cut_len = F.least(F.col("__end"), chunk_lo + chunk_size - 1) - F.greatest(
        F.col("__start"), chunk_lo
    ) + 1
    piece = F.col("chunk").substr(cut_from.cast("int"), cut_len.cast("int"))
    return (
        joined.select(
            "interval_id", "contig", F.col("__start"), F.col("__end"),
            F.struct(F.col("chunk_idx"), piece.alias("piece")).alias("p"),
        )
        .groupBy("interval_id", "contig", "__start", "__end")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("p")), lambda s: s.getField("piece")
                ),
                "",
            ).alias("seq")
        )
        .select(
            "interval_id", "contig",
            F.col("__start").alias(start_col), F.col("__end").alias(end_col), "seq",
        )
    )


def reverse_complement(col: Column | str) -> Column:
    """Strand flip, pure Column expr (the reference uses biopython
    reverse_complement per row, src/etl/protein_sequence_etl.py:94-99)."""
    return F.translate(F.reverse(F.col(col) if isinstance(col, str) else col),
                       "ACGTacgtNn", "TGCAtgcaNn")


_CODONS = {
    "TTT": "F", "TTC": "F", "TTA": "L", "TTG": "L", "CTT": "L", "CTC": "L",
    "CTA": "L", "CTG": "L", "ATT": "I", "ATC": "I", "ATA": "I", "ATG": "M",
    "GTT": "V", "GTC": "V", "GTA": "V", "GTG": "V", "TCT": "S", "TCC": "S",
    "TCA": "S", "TCG": "S", "CCT": "P", "CCC": "P", "CCA": "P", "CCG": "P",
    "ACT": "T", "ACC": "T", "ACA": "T", "ACG": "T", "GCT": "A", "GCC": "A",
    "GCA": "A", "GCG": "A", "TAT": "Y", "TAC": "Y", "TAA": "*", "TAG": "*",
    "CAT": "H", "CAC": "H", "CAA": "Q", "CAG": "Q", "AAT": "N", "AAC": "N",
    "AAA": "K", "AAG": "K", "GAT": "D", "GAC": "D", "GAA": "E", "GAG": "E",
    "TGT": "C", "TGC": "C", "TGA": "*", "TGG": "W", "CGT": "R", "CGC": "R",
    "CGA": "R", "CGG": "R", "AGT": "S", "AGC": "S", "AGA": "R", "AGG": "R",
    "GGT": "G", "GGC": "G", "GGA": "G", "GGG": "G",
}


@pandas_udf(T.StringType())
def translate_cds(seqs: pd.Series) -> pd.Series:
    """Standard-table codon translation, Arrow-batched (T16 analog of
    biopython Seq.translate, src/etl/protein_sequence_etl.py:80-106).
    Trailing partial codons are dropped; unknown codons -> 'X'."""
    table = _CODONS

    def one(s):
        if s is None:
            return None
        s = s.upper()
        return "".join(
            table.get(s[i:i + 3], "X") for i in range(0, len(s) - len(s) % 3, 3)
        )

    return seqs.map(one)
