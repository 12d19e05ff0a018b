"""PII detection / redaction over the documents table.

The standard pre-training scrub pass (emails, phone numbers, IPv4
addresses, US SSNs — the BigCode/StarCoder-style regex tier): count
each PII class per document and produce the redacted text. Patterns
are deliberately restricted to the syntax subset that Java regex
(Spark) and RE2 (the DuckDB oracle) interpret identically — character
classes, bounded repetition, ``\\b`` word boundaries; no lookaround,
no backreferences — so the oracle runs the SAME patterns on an
independent engine.

100 TB posture: every expression is a JVM-side ``regexp_count`` /
``regexp_replace`` inside whole-stage codegen — per-row, no shuffle,
no Python. The redaction replaces each match with a fixed class token
(``<EMAIL>`` etc.) so downstream tokenization stays stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import spread

# (class, pattern, replacement) applied IN ORDER — email first (its
# char class overlaps the dotted patterns), then the dash-shaped SSN
# (3-2-4 digits, disjoint from the 3-3-4 phone), then phone, then IPv4.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII census + redaction digest: one count column per
    PII class, the total, and the md5 of the fully-redacted text (the
    digest keeps the gate value-exact without hauling full text through
    the comparison)."""
    out = spread(docs).select("doc_id", F.col(text_col).alias("_t"))
    counts = []
    red = F.col("_t")
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.regexp_count(F.col("_t"), F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, repl)
    out = out.select("doc_id", *counts, F.md5(red).alias("redacted_md5"))
    total = sum((F.col(f"n_{n}") for n, _, _ in PII_PATTERNS[1:]),
                F.col(f"n_{PII_PATTERNS[0][0]}"))
    return out.withColumn("n_pii", total.cast("long"))
