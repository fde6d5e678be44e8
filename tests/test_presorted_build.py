"""The shuffle-free presorted build path must produce an index equivalent to
the sorting build over the same corpus (identical docIDs, postings stats, and
query results), and must reject unsorted layouts."""

import os

import numpy as np
import pytest

from lucene_solr_spark.datagen import generate_queries, generate_transcripts
from lucene_solr_spark.index.build import build_index, build_index_presorted
from lucene_solr_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def sorted_files(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = generate_transcripts(150).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    d = tmp_path_factory.mktemp("sorted_corpus")
    step = (len(pdf) + 5) // 6
    for i in range(0, len(pdf), step):
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[i:i + step], preserve_index=False),
            str(d / f"part-{i // step:03d}.parquet"),
        )
    return str(d), pdf


def _run(spark, idx):
    s = IndexSearcher(spark, idx)
    qs = generate_queries()[:15]
    compiled = s.compile_many({
        f"q{q['query_id']:02d}": (s.parse(q["qtype"], q["terms"], q["min_should"]), q["k"])
        for q in qs
    })
    return s.search_many(compiled, mode="wand").toPandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)


def test_presorted_equals_sorting_build(spark, sorted_files, tmp_path):
    src_dir, pdf = sorted_files
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    build_index_presorted(spark, src_dir, a_dir, files_per_segment=2)
    build_index(spark, spark.createDataFrame(pdf), b_dir, n_segments=3)

    a, b = _run(spark, a_dir), _run(spark, b_dir)
    assert len(a) == len(b)
    np.testing.assert_array_equal(a.doc_id.to_numpy(), b.doc_id.to_numpy())
    np.testing.assert_array_equal(
        a.score.to_numpy().astype(np.float32), b.score.to_numpy().astype(np.float32)
    )
    # global stats identical
    for tbl in ("stats",):
        sa = spark.read.parquet(os.path.join(a_dir, tbl)).toPandas()
        sb = spark.read.parquet(os.path.join(b_dir, tbl)).toPandas()
        assert sa.equals(sb)


def test_presorted_rejects_unsorted(spark, sorted_files, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src_dir, pdf = sorted_files
    bad = tmp_path / "bad"
    bad.mkdir()
    # write files in REVERSED key order → overlap check must fire
    step = (len(pdf) + 2) // 3
    chunks = [pdf.iloc[i:i + step] for i in range(0, len(pdf), step)]
    for j, c in enumerate(reversed(chunks)):
        pq.write_table(pa.Table.from_pandas(c, preserve_index=False), str(bad / f"part-{j}.parquet"))
    with pytest.raises(ValueError, match="not globally key-sorted"):
        build_index_presorted(spark, str(bad), str(tmp_path / "idx"))
