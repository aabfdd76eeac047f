from .exact import (
    avg_money,
    cents,
    cents_dec,
    sum_money,
    sum_product_money,
    var_exact,
)
from .hashing import hash64, hash64_sql
from .jsonf import json_double, json_str

__all__ = [
    "avg_money",
    "cents",
    "cents_dec",
    "sum_money",
    "sum_product_money",
    "var_exact",
    "hash64",
    "hash64_sql",
    "json_double",
    "json_str",
]
