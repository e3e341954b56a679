"""PII detection + redaction over the document text column.

Three detector classes — email addresses, E.164-ish phone numbers, and
IPv4 literals — each a single regex chosen to parse identically under
Java regex (Spark) and RE2 (DuckDB): no lookaround, no backreferences,
character classes with the dash last. Redaction is sequential
``regexp_replace`` (email -> ip -> phone, so an IP inside an email host
is counted once, as the email), all JVM-side column expressions inside
whole-stage codegen — zero UDFs, zero shuffles; the op rides the scan.

At 100 TB this is the cheapest kind of pass there is: a narrow
projection with pushed-down column pruning (doc_id, text), linear
regex scans per row, no exchange anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java + RE2 portable patterns (see module docstring).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{7,15}"

EMAIL_TAG = "<EMAIL>"
IPV4_TAG = "<IP>"
PHONE_TAG = "<PHONE>"


def redact_pii(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, redacted_fp).

    Counts are occurrence counts of each detector BEFORE any
    replacement on the ORIGINAL text, except that IPs and phones are
    counted on the email-redacted text so a dotted/digit run inside an
    email address is attributed to the email detector only (redaction
    order: email -> ip -> phone). ``redacted_fp`` is md5 of the fully
    redacted text — a compact value-parity handle for the SQL twin
    (shipping whole redacted documents through the compare harness
    would dominate its cost for no extra signal).
    """
    text = F.col(text_col)
    no_email = F.regexp_replace(text, EMAIL_RE, EMAIL_TAG)
    no_ip = F.regexp_replace(no_email, IPV4_RE, IPV4_TAG)
    no_phone = F.regexp_replace(no_ip, PHONE_RE, PHONE_TAG)
    return docs.select(
        id_col,
        F.size(
            F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0))
        ).alias("n_emails"),
        F.size(
            F.regexp_extract_all(no_email, F.lit(IPV4_RE), F.lit(0))
        ).alias("n_ips"),
        F.size(
            F.regexp_extract_all(no_ip, F.lit(PHONE_RE), F.lit(0))
        ).alias("n_phones"),
        F.md5(no_phone).alias("redacted_fp"),
    )


def with_synthetic_pii(
    docs: DataFrame, modulus: int = 7, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministically append PII to every ``modulus``-th document.

    The sandbox fixture corpus contains no organic PII, which would make
    a redaction oracle vacuously green (every count 0, fingerprint ==
    plain fingerprint). This helper plants `` contact user<id>@example.com
    ip 10.0.<id%256>.1 tel +1415555<id%10000 zero-padded>`` on docs with
    doc_id % modulus == 0 — reproducible on the SQL side from the same
    columns, so the driver gate exercises real matches, real
    replacements, and real pass-throughs.
    """
    planted = F.concat(
        F.col(text_col),
        F.lit(" contact user"),
        F.col(id_col).cast("string"),
        F.lit("@example.com ip 10.0."),
        (F.col(id_col) % 256).cast("string"),
        F.lit(".1 tel +1415555"),
        F.lpad((F.col(id_col) % 10000).cast("string"), 4, "0"),
    )
    return docs.withColumn(
        text_col,
        F.when((F.col(id_col) % modulus) == 0, planted).otherwise(F.col(text_col)),
    )
