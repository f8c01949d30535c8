"""PII detection/redaction: Ray Arrow kernels vs the DuckDB RE2 mirror on
planted PII, plus precedence and no-PII invariants."""

import duckdb
import numpy as np
import pandas as pd

import ray.data

from webgraph_ray.stages.text import redact_pii, redact_pii_sql


def _docs():
    texts = [
        "contact alice.smith+x@example.co.uk or bob@ex.io today",
        "server at 10.0.255.3 responded; backup 192.168.1.1 did not",
        "call +1 415 555 0199 or (020) 7946-0958 now",
        "mixed: a@b.com then 8.8.8.8 then +33 1 22 33 44 55 end",
        "no pii here at all",
        "",
        "edge email-ish @not.an.email and bare 1.2.3 (not ipv4)",
    ]
    return pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )


def test_redact_pii_matches_duckdb():
    df = _docs()
    got = (
        redact_pii(ray.data.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(redact_pii_sql()).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[list(exp.columns)], exp, check_dtype=False
    )


def test_redact_pii_semantics():
    df = _docs()
    out = (
        redact_pii(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "n_email"] == 2 and "<EMAIL>" in out.loc[0, "redacted_text"]
    assert "alice" not in out.loc[0, "redacted_text"]
    assert out.loc[1, "n_ipv4"] == 2 and "<IP>" in out.loc[1, "redacted_text"]
    assert out.loc[2, "n_phone"] == 2 and "<PHONE>" in out.loc[2, "redacted_text"]
    # precedence: the email consumed its digits before ip/phone ran
    assert out.loc[3, ["n_email", "n_ipv4", "n_phone"]].tolist() == [1, 1, 1]
    # no-PII rows pass through byte-identical
    assert out.loc[4, "redacted_text"] == "no pii here at all"
    assert out.loc[4, ["n_email", "n_ipv4", "n_phone"]].sum() == 0
    assert out.loc[5, "redacted_text"] == ""
