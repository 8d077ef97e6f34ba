"""Round-trip: records -> WoS tagged text sink -> WoS scan -> same fields.

Exercises the sink/source pair as inverses (the reference's xlsx2vos writer
and wos2xlsx parser form the same loop)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bibexpy_spark.sinks import exporters
from bibexpy_spark.sources import wos


def test_wos_sink_then_scan_roundtrip(spark, tmp_path):
    rows = [
        ("Smith, J.; Doe, A.", "A STUDY OF THINGS", "JOURNAL ONE", "2020",
         "10.1/x.1", "5"),
        ("Lee, B.", "ANOTHER STUDY ENTIRELY", "JOURNAL TWO", "2021",
         "10.2/y.2", "12"),
        ("Wu, C.", "THIRD RECORD HERE", "JOURNAL THREE", "2019",
         "10.3/z.3", "0"),
    ]
    df = spark.createDataFrame(rows, ["AU", "TI", "SO", "PY", "DI", "TC"])

    out = str(tmp_path / "wos_out")
    exporters.write_wos_text(df, out)

    back = wos.read_wos_tagged(spark, out)
    assert back.count() == 3
    got = {
        r["DI"]: (r["TI"], r["SO"], r["PY"], r["TC"])
        for r in back.collect()
    }
    for au, ti, so, py, di, tc in rows:
        assert di in got, f"{di} lost in roundtrip"
        gti, gso, gpy, gtc = got[di]
        assert gti == ti and gso == so and gpy == py and gtc == tc
    # multi-value AU survives, ';'-joined and comma-stripped — the exact
    # isi2df output shape (wos2xlsx.py:73-99)
    au0 = {r["DI"]: r["AU"] for r in back.collect()}["10.1/x.1"]
    assert "SMITH  J." in au0 and "DOE  A." in au0 and ";" in au0
