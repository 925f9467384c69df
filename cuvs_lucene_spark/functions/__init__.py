from cuvs_lucene_spark.functions.tokenize import (
    TOKEN_PATTERN,
    tokenize_expr,
    tokenize_py,
    doclen_expr,
)
from cuvs_lucene_spark.functions.varint import varint_encode, varint_decode

__all__ = [
    "TOKEN_PATTERN",
    "tokenize_expr",
    "tokenize_py",
    "doclen_expr",
    "varint_encode",
    "varint_decode",
]
