"""PII redaction / text cleaning for training-data pipelines.

A standard pre-training hygiene step (alongside dedup, quality
filtering, and decontamination): scrub emails, phone numbers, and IP
addresses from the corpus before anything else sees it.  The reference
engine has no analog (its nearest surface is the full-text index);
this extends the pipeline family the same way ``decontaminate.py`` and
``chunk.py`` do.

Scale design: every function is a pure Column expression
(``regexp_count`` / ``regexp_replace`` chains — JVM codegen, no Python
in the hot path, no shuffle: redaction is row-local, so it streams
map-side through whatever scan partitioning the corpus already has).
Patterns are RE2-safe (no backreferences/lookaround) so a DuckDB
oracle can run the identical logic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: shared with the DuckDB oracle in ``__spark_entry__`` — keep RE2-safe
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"

#: replacement tokens (angle-bracket sentinels survive tokenization
#: boundaries and are greppable downstream)
EMAIL_TOKEN, IPV4_TOKEN, PHONE_TOKEN = "<EMAIL>", "<IP>", "<PHONE>"


def count_emails(text: Column) -> Column:
    return F.regexp_count(text, F.lit(EMAIL_RE)).cast("long")


def count_ipv4(text: Column) -> Column:
    return F.regexp_count(text, F.lit(IPV4_RE)).cast("long")


def count_phones(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PHONE_RE)).cast("long")


def redact_pii(text: Column) -> Column:
    """Redact emails, then phone numbers, then IPv4 addresses (emails
    first so their digit runs can't partially match the later
    patterns; counts are taken on the ORIGINAL text for the same
    reason)."""
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)
    return F.regexp_replace(out, IPV4_RE, IPV4_TOKEN)


def pii_frame(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, redacted, n_emails, n_ips, n_phones) — the audit-plus-
    redact shape a pipeline materializes (counts feed the data card,
    redacted text feeds the next stage)."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        redact_pii(t).alias("redacted"),
        count_emails(t).alias("n_emails"),
        count_ipv4(t).alias("n_ips"),
        count_phones(t).alias("n_phones"),
    )
