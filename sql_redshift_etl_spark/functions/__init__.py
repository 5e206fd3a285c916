from sql_redshift_etl_spark.functions.dialect import (
    dec,
    dsum,
    davg,
    decode,
    nvl,
    nvl2,
    to_char,
    redshift_datediff,
    json_extract_path_text,
    listagg,
    split_part,
)

__all__ = [
    "dec",
    "dsum",
    "davg",
    "decode",
    "nvl",
    "nvl2",
    "to_char",
    "redshift_datediff",
    "json_extract_path_text",
    "listagg",
    "split_part",
]
