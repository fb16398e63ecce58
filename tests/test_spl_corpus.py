"""Full SPL corpus replay.

Runs EVERY pipeline of the reference's SPL test corpus
(core/unittest/spl/spl.txt, 230 lines) through the SPL front-end against
an input row shaped like SplUnittest.cpp's event contents. A pipeline
passes when it compiles to a Catalyst plan and fully evaluates
(collect(), so every projected column is computed — count() would let
Catalyst prune a broken expression away).

Pipelines whose scalar functions genuinely have no Spark analog are
xfailed EXPLICITLY below with the reason — the supported/unsupported
split is reported in COVERAGE.md (tools/spl_corpus_report.py).
"""

from __future__ import annotations

import os

import pytest

from loongcollector_spark.spl import SplUnsupported, spl_run

CORPUS_PATH = "/root/reference/core/unittest/spl/spl.txt"

# substring → reason; any corpus line containing the substring is an
# expected failure (no Spark analog / Velox-only behavior)
XFAIL = {
    "slice(a, 0, 3)": "0 start index rejected by both Spark and Presto",
}


def _corpus() -> list[str]:
    if not os.path.exists(CORPUS_PATH):
        return []
    with open(CORPUS_PATH) as f:
        return [ln.strip() for ln in f if ln.strip()]


CORPUS = _corpus()


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = [
        (
            "10.0.0.1 GET /index extra",
            '{"a1":"bbbb","c":"d"}',
            '{"body": {"a": 1, "b": 2}}',
            '1.1.1.1,"2026-01-01 00:00:00",host1',
            "2.2.2.2;2026;host2",
            "a=1&b=2?c=3",
            "a:1&b:2?c:3",
            "3.3.3.3,2026,host3",
            '4.4.4.4\t"2026"\thost4',
            "5.5.5.5\\2026\\host5",
            "6.6.6.6\t2026\thost6",
            "7.7.7.7\t2026\thost7",
        ),
        (
            "192.168.9.9 POST /api/v1 tail",
            '{"a1":"ccc","c1":"d1"}',
            '{"body": {"a": 7, "b": 9}}',
            "8.8.8.8,later,host8",
            "9.9.9.9;2027;host9",
            "x=10&y=20?z=30",
            "x:10&y:20?z:30",
            "10.10.10.10,2027,host10",
            "11.11.11.11\t2027\thost11",
            "12.12.12.12\\2027\\host12",
            "13.13.13.13\t2027\thost13",
            "14.14.14.14\t2027\thost14",
        ),
    ]
    return spark.createDataFrame(
        rows,
        "content string, map_str string, content_body string, "
        "content_csv string, content_delim string, content_kv string, "
        "content_sep string, content_simp string, content_complex string, "
        "content_delim1 string, content_delim2 string, content_delim3 string",
    )


def _params():
    for i, line in enumerate(CORPUS):
        marks = []
        for sub, reason in XFAIL.items():
            if sub in line:
                marks = [pytest.mark.xfail(reason=reason, strict=True)]
                break
        yield pytest.param(line, id=f"L{i:03d}", marks=marks)


@pytest.mark.skipif(not CORPUS, reason="reference corpus not present")
@pytest.mark.parametrize("line", _params())
def test_spl_corpus_line(corpus_df, line):
    try:
        outs = spl_run(corpus_df, line)
    except SplUnsupported as e:
        pytest.fail(f"unsupported: {e}")
    for frame in outs.values():
        rows = frame.collect()  # full evaluation of every column
        assert len(rows) == 2
