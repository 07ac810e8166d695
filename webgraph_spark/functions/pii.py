"""PII detection/redaction for training-data pipelines.

Standard pre-training scrub pass (the publicly documented posture of
large-corpus pipelines: regex classes for emails / IP addresses / phone
numbers, replaced by typed placeholder tokens). All expressions are
built-in JVM ``regexp_*`` functions — whole-stage codegen, no Python in
the hot path — and every pattern is restricted to syntax shared by Java
regex and RE2 (no backreferences, no lookaround) so the DuckDB oracle
can run the identical patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .hashing import md5_long

# Pattern order matters: emails first (an email contains digit runs a
# phone pattern could nibble), then IPs, then phone-like digit runs.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d[\d\- ]{7,}\d"

PII_PATTERNS = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def scrub_pii(text: Column) -> Column:
    """Replace every PII match with its placeholder, in class order."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per document: match count per PII class + a portable fingerprint
    of the scrubbed text (md5_long — lets an oracle verify the actual
    redacted output, not just the counts)."""
    cols = [F.col(id_col).alias("doc_id")]
    for name, pat, _ in PII_PATTERNS:
        # pattern passed as a Column literal — dodges Spark SQL string
        # escape processing (F.expr would eat the regex backslashes)
        cols.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
    cols.append(md5_long(scrub_pii(F.col(text_col))).alias("scrubbed_fp"))
    return df.select(*cols)
