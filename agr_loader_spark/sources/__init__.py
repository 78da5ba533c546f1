from .formats import (  # noqa: F401
    read_commented_tsv,
    read_gaf,
    read_gff3,
    read_obo_terms,
    read_kv_attr_table,
)
