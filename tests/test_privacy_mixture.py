"""PII redaction and mixture-sampling tests."""

import pytest
from pyspark.sql import functions as F

from dask_grblas_spark.functions.privacy import redact_pii
from dask_grblas_spark.functions.sampling import mixture_sample


def test_redact_pii_patterns(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-ample.org then 10.20.30.40 and 12345678 ok"),
         (2, "no pii here just words and 123"),
         (3, "two mails x@y.io z@w.ai ip 1.2.3.4 num 99999999999")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["clean_text"] == "mail <EMAIL> then <IP> and <NUM> ok"
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_longnums"]) \
        == (1, 1, 1)
    assert out[2]["clean_text"] == "no pii here just words and 123"
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_longnums"]) \
        == (0, 0, 0)
    assert out[3]["n_emails"] == 2 and out[3]["n_ips"] == 1
    assert out[3]["n_longnums"] == 1
    assert "<EMAIL>" in out[3]["clean_text"]


def test_redact_email_digits_not_double_counted(spark):
    # digits inside an email are scrubbed WITH the email and never
    # counted as a bare long number
    df = spark.createDataFrame([(1, "reach 12345678@example.com now")],
                               "doc_id long, text string")
    r = redact_pii(df).collect()[0]
    assert r["clean_text"] == "reach <EMAIL> now"
    assert r["n_emails"] == 1 and r["n_longnums"] == 0


def _sourced(spark, sizes=(100, 300, 500, 700)):
    rows = []
    nxt = 0
    for s, n in enumerate(sizes):
        for _ in range(n):
            rows.append((nxt, s))
            nxt += 1
    return spark.createDataFrame(rows, "doc_id long, source long")


def test_mixture_sample_temperature_reweights(spark):
    df = _sourced(spark)
    out = mixture_sample(df, "source", alpha=0.5, target_frac=0.5,
                         id_col="doc_id")
    kept = (out.filter("mix_keep").groupBy("source")
               .agg(F.count("*").alias("k")).collect())
    k = {r["source"]: r["k"] for r in kept}
    # selected counts should be ~ n_s^0.5-proportional: the 700-source
    # keeps far LESS than 7x the 100-source (natural would be 7x)
    assert k[3] < 3.5 * k[0]
    # and the overall rate lands near the target
    total = sum(k.values())
    assert total == pytest.approx(0.5 * 1600, rel=0.15)


def test_mixture_sample_alpha1_is_uniform_rate(spark):
    df = _sourced(spark)
    rates = (mixture_sample(df, "source", alpha=1.0, target_frac=0.25)
             .select("source", "p_keep").distinct().collect())
    for r in rates:
        assert r["p_keep"] == pytest.approx(0.25, abs=1e-9)


def test_mixture_sample_deterministic(spark):
    df = _sourced(spark, sizes=(50, 150))
    a = sorted((r["doc_id"], r["mix_keep"])
               for r in mixture_sample(df, "source").collect())
    b = sorted((r["doc_id"], r["mix_keep"])
               for r in mixture_sample(df, "source").collect())
    assert a == b
