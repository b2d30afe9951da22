"""PII detection / redaction operators (training-data pipeline).

Before corpus text is used for training, contact strings (emails, phone
numbers, ids) are detected and masked. Everything here is JVM-side
``regexp_count`` / ``regexp_replace`` — no Python in the loop, so the
scan parallelizes per input split and survives a 100× scale-up with no
shuffle at all (pure map).

The driver's synthetic documents contain no PII, so the operator first
derives a contact-annotated text column deterministically from
``doc_id`` (same derivation in the DuckDB oracle) — the regex pipeline
is exercised end-to-end on both engines with non-trivial hit counts.

Patterns are written in the common Java-regex ∩ RE2 dialect so Spark
and DuckDB compile them identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# common-dialect patterns (no lookarounds, no backrefs)
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

# deterministic contact annotation: every 3rd doc gets an email, every
# 4th a phone number — derived from doc_id only, so the oracle can
# reproduce it exactly.
_ANNOT_SPARK = (
    "concat(text,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' contact user', cast(doc_id AS string), '@example.com') ELSE '' END,"
    " CASE WHEN doc_id % 4 = 0 THEN concat(' call +1-555-', lpad(cast(doc_id % 10000 AS string), 4, '0')) ELSE '' END)"
)
_ANNOT_DUCK = (
    "concat(text,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' contact user', doc_id::VARCHAR, '@example.com') ELSE '' END,"
    " CASE WHEN doc_id % 4 = 0 THEN concat(' call +1-555-', lpad((doc_id % 10000)::VARCHAR, 4, '0')) ELSE '' END)"
)


def pii_redaction(t: dict[str, DataFrame]) -> DataFrame:
    """Detect and mask emails / phone numbers per document; emit the
    redacted text plus per-category hit counts (the audit columns a
    privacy pipeline logs). Map-only: no shuffle, full pushdown.
    """
    docs = t["documents"]
    annotated = docs.select("doc_id", F.expr(_ANNOT_SPARK).alias("raw"))
    return annotated.select(
        "doc_id",
        F.regexp_count("raw", F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count("raw", F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("raw", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("redacted"),
    )


ORACLES: dict[str, str] = {
    "text_pii_redaction": f"""
        WITH annotated AS (
            SELECT doc_id, {_ANNOT_DUCK} AS raw FROM documents
        )
        SELECT doc_id,
               len(regexp_extract_all(raw, '{EMAIL_RE}'))::BIGINT AS n_emails,
               len(regexp_extract_all(raw, '{PHONE_RE}'))::BIGINT AS n_phones,
               regexp_replace(regexp_replace(raw, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{PHONE_RE}', '<PHONE>', 'g') AS redacted
        FROM annotated
    """,
}

BUILDERS = {
    "text_pii_redaction": pii_redaction,
}
