"""Host-level rollups (ops/web.py)."""

from __future__ import annotations

import pytest
def test_host_quality_rollup(spark):
    """Planted per-host profiles: duplicate-heavy, short-doc-heavy,
    healthy, and a NULL host — exact counts, ratios, verdicts."""
    from gojsonschema_spark.ops.web import host_quality_rollup

    long = "this is a sufficiently long and varied document " * 3
    rows = (
        # healthy: 3 unique long docs
        [("good.com", long + str(i)) for i in range(3)]
        # dup farm: 4 docs, 3 byte-identical (after normalization)
        + [("farm.com", "copy copy copy " * 20)] * 3
        + [("farm.com", long + "x")]
        # short site: 2 tiny docs
        + [("tiny.com", "hi there")] * 1
        + [("tiny.com", "ok")]
        # unparseable host
        + [(None, long + "y")])
    df = spark.createDataFrame(rows, "host string, text string")
    out = {r.host: r for r in host_quality_rollup(
        df, min_docs=2, short_tokens=10, max_dup_frac=0.5,
        max_short_frac=0.5).collect()}

    assert out["good.com"].n_docs == 3 and out["good.com"].dup_docs == 0
    assert out["good.com"].keep == 1
    farm = out["farm.com"]
    assert (farm.n_docs, farm.dup_docs) == (4, 2)
    assert farm.dup_frac == pytest.approx(0.5)
    assert farm.keep == 1  # exactly at the dup threshold: kept
    tiny = out["tiny.com"]
    assert tiny.short_frac == 1.0 and tiny.keep == 0
    assert out[None].n_docs == 1 and out[None].keep == 0  # min_docs=2
    # stricter dup threshold flips the farm
    strict = {r.host: r.keep for r in host_quality_rollup(
        df, min_docs=2, short_tokens=10, max_dup_frac=0.49,
        max_short_frac=0.5).collect()}
    assert strict["farm.com"] == 0
