"""CLI surface tests: the graph and report subcommands drive the same
operators the driver queries use, via main(argv) in-process (Ray comes
from the session fixture — _ensure_ray is guarded)."""
import pyarrow as pa
import pyarrow.parquet as pq

from webcollector_ray.__main__ import main


def test_cli_graph_pagerank(ray_session, tmp_path, capsys):
    edges = tmp_path / "edges.parquet"
    pq.write_table(
        pa.table({"src": ["a", "a", "b", "c"], "dst": ["b", "c", "a", "a"]}),
        edges,
    )
    out = tmp_path / "pr"
    main(["graph", "--edges", str(edges), "--op", "pagerank",
          "--iters", "2", "--buckets", "4", "--out", str(out)])
    got = pq.read_table(str(out)).to_pandas().set_index("url")["pr_fp"]
    # 'a' receives from both leaves -> highest rank
    assert got["a"] > got["b"] == got["c"]


def test_cli_graph_components(ray_session, tmp_path, capsys):
    edges = tmp_path / "edges.parquet"
    pq.write_table(
        pa.table({"src": ["a", "d"], "dst": ["b", "e"]}), edges
    )
    main(["graph", "--edges", str(edges), "--op", "components",
          "--buckets", "4"])
    printed = capsys.readouterr().out
    assert "2" in printed  # two components of size 2


def test_cli_report(ray_session, tmp_path, capsys):
    docs = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table({
            "doc_id": [1, 2, 3],
            "text": ["a b c", "a b c", "x y"],
            "source": ["s1", "s1", "s2"],
            "lang": ["en", "en", "de"],
        }),
        docs,
    )
    out = tmp_path / "report"
    main(["report", "--docs", str(docs), "--top-words", "3",
          "--out", str(out)])
    dup = pq.read_table(str(out / "dup_rate.parquet")).to_pandas()
    r = dup.set_index("source")
    assert r.loc["s1", "n_docs"] == 2 and r.loc["s1", "n_distinct"] == 1
    assert r.loc["s2", "dup_rate"] == 0.0
    top = pq.read_table(str(out / "top_words.parquet")).to_pandas()
    assert top.iloc[0]["word"] in ("a", "b", "c")
