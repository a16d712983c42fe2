from nametag3_spark.functions.text import (  # noqa: F401
    nfc_truncate_series,
    tokenize_series,
    truecase_series,
)
