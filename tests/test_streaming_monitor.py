"""Streaming stored-query monitor (lucene/monitor over a doc stream with
per-doc MemoryIndex matching): the streaming face must converge to the
batch face (engine.monitor_matches over a persisted corpus index) on the
same documents — the Monitor-vs-IndexSearcher agreement the reference's
monitor tests assert."""

import os

import pytest

SF = "/root/testdata/sf0.001"

REGISTRY = {
    "alert_and": ("and2", ("merge", "batch"), 0),
    "alert_msm": ("or_minshould", ("vector", "stream", "filter"), 2),
    "alert_phrase": ("phrase2", ("table", "hash"), 0),
    "alert_not": ("and_not", ("scan", "join"), 0),
}


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_stream_converges_to_batch_monitor(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_spark.engine import get_engine
    from lucene_solr_spark.streaming.monitor import monitor_stream

    batch = get_engine(spark, SF, "simple").monitor_matches(REGISTRY).toPandas()
    want = {(q, int(d)) for q, d in zip(batch.query_id, batch.doc_id)}
    assert want, "fixture registry must alert on the corpus"

    # stream the SAME docs in 3 arrival chunks
    import duckdb

    pdf = duckdb.sql(
        f"SELECT doc_id, text FROM '{os.path.join(SF, 'documents.parquet')}' ORDER BY doc_id"
    ).df()
    src = tmp_path / "stream_src"
    src.mkdir()
    n = len(pdf)
    step = (n + 2) // 3
    for i in range(0, n, step):
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[i:i + step], preserve_index=False),
            str(src / f"arrival-{i // step}.parquet"),
        )
    out = str(tmp_path / "alerts")
    monitor_stream(
        spark, str(src), str(tmp_path / "ckpt"), out,
        "doc_id long, text string", REGISTRY,
    )
    got_pdf = spark.read.parquet(out).toPandas()
    got = {(q, int(d)) for q, d in zip(got_pdf.query_id, got_pdf.doc_id)}
    assert got == want

    # restart durability: draining again with the same checkpoint emits
    # nothing new (the topic offset persisted)
    monitor_stream(
        spark, str(src), str(tmp_path / "ckpt"), out,
        "doc_id long, text string", REGISTRY,
    )
    again = spark.read.parquet(out).count()
    assert again == len(got_pdf)
