"""Tests for the WoS/Scopus scans and the export sinks (SURVEY.md §2.1)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bibexpy_spark.sinks import exporters
from bibexpy_spark.sources import scopus, wos


@pytest.fixture(scope="module")
def wos_df(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("wos") / "sample.txt")
    wos.write_sample_wos(path, n_docs=25)
    return wos.read_wos_tagged(spark, path).persist()


def test_wos_scan_doc_count_and_tags(wos_df):
    assert wos_df.count() == 25
    for tag in ("PT", "AU", "TI", "SO", "PY", "DI", "TC", "C1", "C1raw"):
        assert tag in wos_df.columns, f"missing tag column {tag}"


def test_wos_continuation_lines_joined(wos_df):
    """Multi-line AU joins with ';' (one author per separator) and commas
    are stripped; other tags (TI) space-join — exact isi2df post-processing
    (wos2xlsx.py:73-99: comma_tags='---'→';', others '---'→' ', AU ','→' ')."""
    row = wos_df.filter(F.col("AU").contains("AUTHOR0")).first()
    assert ";" in row["AU"]              # two author lines -> ';'-joined
    assert "COAUTHOR0" in row["AU"]
    assert "," not in row["AU"]          # AU comma strip
    assert "---" not in row["TI"]        # title wrapped across lines
    assert len(row["TI"].split()) == 6   # 6 words space-joined


def test_wos_c1_bracket_strip_and_raw(wos_df):
    """C1raw keeps the '[author]' prefix; C1 strips it and splits on '.'
    (wos2xlsx.py:86-91)."""
    row = wos_df.orderBy("doc_id").first()
    assert row["C1raw"].startswith("[")
    assert "[" not in row["C1"]
    assert row["DB"] == "ISI"


def test_wos_uppercase_except_di(wos_df):
    row = wos_df.orderBy("doc_id").first()
    assert row["SO"] == row["SO"].upper()
    assert row["DI"].startswith("10.")   # DI preserves case (lowercase doi)
    assert "synthetic" in row["DI"]


def test_scopus_multi_csv_union_and_rename(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scp"))
    paths = scopus.write_sample_scopus(d)
    df = scopus.read_scopus_csv(spark, paths)
    # common columns only: Abstract exists in file A only -> dropped
    assert "AB" not in df.columns
    for tag in ("AU", "TI", "PY", "SO", "DI", "TC"):
        assert tag in df.columns
    assert df.count() == 20  # 12 + 8
    # uppercase applied except DI
    row = df.orderBy(F.desc("DI")).first()
    assert row["SO"] == row["SO"].upper()
    assert "scp" in row["DI"]


@pytest.fixture(scope="module")
def records_df(spark):
    rows = [
        ("Smith, J.; Doe, A.", "A Study of Things", "JOURNAL ONE", "2020",
         "10.1/x.1", "kw1; kw2", "5"),
        ("Lee, B.", "Another & Better {Study}", "JOURNAL TWO", "2021",
         "10.2/y.2", "kw3", ""),
    ]
    return spark.createDataFrame(
        rows, ["AU", "TI", "SO", "PY", "DI", "DE", "TC"]
    )


def test_wos_text_sink(records_df):
    texts = [r["text"] for r in exporters.to_wos_text(records_df).collect()]
    assert all(t.startswith("PT J") for t in texts)
    assert all(t.rstrip().endswith("ER") for t in texts)
    joined = "\n".join(texts)
    assert "AU Smith, J.\n   Doe, A." in joined  # multi-value -> one per line
    assert "DI 10.1/x.1" in joined
    # empty TC cell must be omitted entirely
    assert "\nTC \n" not in joined


def test_ris_sink(records_df):
    texts = [r["text"] for r in exporters.to_ris_text(records_df).collect()]
    assert all(t.startswith("TY  - JOUR") for t in texts)
    joined = "\n".join(texts)
    assert "AU  - Smith, J." in joined
    assert "AU  - Doe, A." in joined
    assert "DO  - 10.1/x.1" in joined
    assert "ER  - " in joined


def test_bibtex_sink_escapes_latex(records_df):
    texts = [r["text"] for r in exporters.to_bibtex_text(records_df).collect()]
    joined = "\n".join(texts)
    assert "@article{" in joined
    assert "author = {Smith, J. and Doe, A.}" in joined
    assert "\\&" in joined            # & escaped
    assert "\\{Study\\}" in joined    # braces escaped


def test_vos_tsv_column_subset(records_df):
    out = exporters.to_vos_tsv(records_df)
    assert set(out.columns) == {"AU", "TI", "SO", "PY", "TC", "DI", "DE"}


def test_export_dispatch(records_df, tmp_path):
    exporters.export(records_df, str(tmp_path / "c"), "csv")
    exporters.export(records_df, str(tmp_path / "w"), "wos")
    assert os.path.isdir(str(tmp_path / "c"))
    with pytest.raises(ValueError):
        exporters.export(records_df, str(tmp_path / "z"), "nope")


def test_wos_splittable_reader_matches_wholefile(spark, tmp_path_factory):
    """The record-delimiter reader (single huge export path) must produce
    EXACTLY the same wide table as the wholeTextFiles reader."""
    path = str(tmp_path_factory.mktemp("wos_split") / "sample.txt")
    wos.write_sample_wos(path, n_docs=25)
    a = wos.read_wos_tagged(spark, path).toPandas().sort_values("doc_id")
    b = wos.read_wos_tagged_splittable(spark, path).toPandas().sort_values("doc_id")
    assert sorted(a.columns) == sorted(b.columns)
    a = a[sorted(a.columns)].reset_index(drop=True)
    b = b[sorted(b.columns)].reset_index(drop=True)
    assert a.equals(b)


def test_wos_default_reader_size_dispatch(spark, tmp_path_factory):
    """read_wos dispatches by file size: a tiny threshold forces the
    splittable path; the default keeps wholeTextFiles — identical output
    either way (VERDICT r2 #7)."""
    path = str(tmp_path_factory.mktemp("wos_dispatch") / "sample.txt")
    wos.write_sample_wos(path, n_docs=25)

    default = wos.read_wos(spark, path).toPandas().sort_values("doc_id")
    forced = wos.read_wos(spark, path, threshold_bytes=1).toPandas().sort_values("doc_id")
    assert sorted(default.columns) == sorted(forced.columns)
    d = default[sorted(default.columns)].reset_index(drop=True)
    f = forced[sorted(forced.columns)].reset_index(drop=True)
    assert d.equals(f)
    assert len(d) == 25


def test_wos_default_reader_mixed_sizes(spark, tmp_path_factory):
    """A directory with one oversize and one small export unions both
    reader outputs by name."""
    d = tmp_path_factory.mktemp("wos_mixed")
    small = str(d / "small.txt")
    big = str(d / "big.txt")
    wos.write_sample_wos(small, n_docs=3)
    wos.write_sample_wos(big, n_docs=10)
    threshold = os.path.getsize(small)  # big exceeds, small does not
    out = wos.read_wos(spark, str(d / "*.txt"), threshold_bytes=threshold)
    pdf = out.toPandas()
    assert len(pdf) == 13
    assert pdf.groupby("file")["doc_id"].nunique().sum() == 13


def test_wos_file_uri_with_glob_metachars(spark, tmp_path_factory):
    """Regression (r4 review): a file: URI whose path contains '?' (a glob
    metacharacter, NOT a query delimiter — local paths are not URL-encoded)
    must keep glob semantics; urlparse used to truncate at the '?'.  Both
    file:/abs and file:///abs forms resolve."""
    d = tmp_path_factory.mktemp("wos_uri")
    for i in range(3):
        wos.write_sample_wos(str(d / f"wos-{i}.txt"), n_docs=2)

    got = wos.read_wos(spark, f"file:{d}/wos-?.txt").toPandas()
    assert len(got) == 6
    got3 = wos.read_wos(spark, f"file://{d}/wos-?.txt").toPandas()
    assert len(got3) == 6
