"""The driver keeps only the last ~2,000 chars of bench stdout; the compact
line must always fit (BENCH_r07.json landed parsed:null when spread/loadavg
grew the single line past that)."""

import json

import bench


def _full(queries: dict, *, partial=None, errors=None) -> dict:
    full = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "passes": 2,
        "loadavg_start": [1.23, 2.34, 3.45],
    }
    if partial:
        full["partial"] = partial
    if errors:
        full["errors"] = errors
    return full


def test_compact_line_current_headline_fits_untruncated():
    # The real headline list, with realistic magnitudes: EVERY per-query
    # timing must survive untruncated (that is the artifact's point).
    # loadavg is the ladder's first shed and may drop once the headline
    # outgrows the line budget — it always lives in tools/BENCH_full.json.
    line = bench.compact_line(_full({n: 12.345 for n in bench.HEADLINE}))
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["value"] > 0
    assert len(parsed["queries"]) == len(bench.HEADLINE)
    assert "queries_truncated" not in parsed


def test_compact_line_limit_is_a_hard_guarantee():
    # Pathologically long names: the line must STILL fit and parse, keeping
    # the true total and the slowest entries (truncation flagged).
    qs = {f"q_some_quite_long_query_name_{i:03d}": float(i) for i in range(200)}
    full = _full(qs, partial=["q_x"], errors={"q_y": "boom"})
    line = bench.compact_line(full)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["value"] == full["value"]
    assert parsed["queries_truncated"] + len(parsed["queries"]) == 200
    # slowest kept first
    assert "q_some_quite_long_query_name_199" in parsed["queries"]


def test_compact_line_errors_are_names_only():
    full = _full({f"q_{i}": 1.0 for i in range(5)},
                 errors={"q_y": "SomeError: " + "x" * 500})
    parsed = json.loads(bench.compact_line(full))
    assert parsed["errors"] == ["q_y"]
