"""Distributed segment merge — ``L/index/SegmentMerger#merge`` re-expressed
as a salted two-phase shuffle (the north rule's hot-term skew treatment).

Because docIDs are GLOBAL dense ranks (one contiguous range per segment,
bases increasing with segment id — see build.py), merging K segments needs
no ``MergeState.DocMap`` remap: a term's merged posting list is the
seg-ordered concatenation of its per-segment lists, already docID-sorted.

Two-phase shape (``TieredMergePolicy``'s work, minus the remap):

  phase 1  groupBy(term, out_seg, SALT) — salt = contiguous sub-range of
           input segments. Each task decodes + re-encodes only its
           sub-range's postings into fresh 128-doc blocks. A hot term
           (30% of all docs) is split across `salt` tasks instead of
           serializing into one reducer — the skew fix.
  phase 2  groupBy(term, out_seg) — concatenates the salt groups' BLOCK
           LISTS in salt order (no decode: block structs are just stacked,
           mid-list partial blocks are legal). Cheap, skew-immune.

Impact metadata: per-block (max_tf, min_norm) is recomputed exactly when the
per-doc norm array fits driver memory (broadcast); for larger indexes pass
``conservative_impacts=True`` to derive each new block's min_norm as the min
over overlapping source blocks — a looser but still VALID upper bound (WAND
results are unchanged; only pruning efficiency differs).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from .build import IndexMeta
from .codec import BLOCK_SIZE, decode_block, encode_posting_blocks

_BLOCKS_DDL = (
    "array<struct<first_doc:bigint,last_doc:bigint,n:int,max_tf:int,"
    "min_norm:int,docs_bytes:binary,tfs_bytes:binary,pos_bytes:binary>>"
)
PHASE1_SCHEMA = (
    f"term string, seg int, salt int, df_part bigint, ttf_part bigint, blocks {_BLOCKS_DDL}"
)
PHASE2_SCHEMA = f"term string, seg int, df_part bigint, ttf_part bigint, blocks {_BLOCKS_DDL}"


def _load_seg_layout(spark: SparkSession, index_dir: str) -> pd.DataFrame:
    sn = spark.read.parquet(os.path.join(index_dir, "seg_norms")).select("seg", "base", "n")
    return sn.toPandas().sort_values("base").reset_index(drop=True)


def _load_global_norms(index_dir: str, layout: pd.DataFrame) -> np.ndarray:
    """Dense norms array indexed by global docID (broadcastable while the
    doc count fits memory — 1 byte/doc)."""
    import pyarrow.parquet as pq

    total = int((layout.base + layout.n).max()) if len(layout) else 0
    out = np.zeros(total, dtype=np.uint8)
    for seg, base, n in layout[["seg", "base", "n"]].itertuples(index=False):
        t = pq.read_table(os.path.join(index_dir, "seg_norms", f"seg={seg}")).to_pandas()
        arr = np.frombuffer(t["norms"].iloc[0], dtype=np.uint8)
        out[base:base + len(arr)] = arr
    return out


def _phase1_kernel(norms_bc, positions: bool, in_bases: dict[int, int], out_bases: dict[int, int]):
    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        term, out_seg, salt = key
        out_base = out_bases[int(out_seg)]
        pdf = pdf.sort_values("in_seg")
        docs_l, tfs_l, pos_l = [], [], []
        cons_min_norm: list[tuple[int, int, int]] = []  # (first, last, min_norm) GLOBAL
        for in_seg, blocks in zip(pdf["in_seg"], pdf["blocks"]):
            in_base = in_bases[int(in_seg)]
            for blk in blocks:
                dec = decode_block(blk, with_positions=positions)
                docs_l.append(dec[0] + in_base)  # globalize
                tfs_l.append(dec[1])
                if positions:
                    pos_l.append(dec[2])
                cons_min_norm.append(
                    (int(blk["first_doc"] if isinstance(blk, dict) else blk.first_doc) + in_base,
                     int(blk["last_doc"] if isinstance(blk, dict) else blk.last_doc) + in_base,
                     int(blk["min_norm"] if isinstance(blk, dict) else blk.min_norm))
                )
        docs = np.concatenate(docs_l) if docs_l else np.empty(0, dtype=np.int64)
        tfs = np.concatenate(tfs_l) if tfs_l else np.empty(0, dtype=np.int64)
        pos = (np.concatenate(pos_l) if pos_l else None) if positions else None
        if norms_bc is not None:
            norms = norms_bc.value[docs]
        else:
            # conservative: min over source blocks covering each doc
            norms = np.full(len(docs), 255, dtype=np.int64)
            for first, last, mn in cons_min_norm:
                sel = (docs >= first) & (docs <= last)
                norms[sel] = np.minimum(norms[sel], mn)
        blocks = encode_posting_blocks(docs - out_base, tfs, norms.astype(np.int64), pos)
        return pd.DataFrame([{
            "term": term, "seg": int(out_seg), "salt": int(salt),
            "df_part": int(len(docs)), "ttf_part": int(tfs.sum()),
            "blocks": blocks,
        }])

    return kernel


def _phase2_kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
    term, out_seg = key
    pdf = pdf.sort_values("salt")
    blocks: list = []
    for bl in pdf["blocks"]:
        blocks.extend(list(bl))
    return pd.DataFrame([{
        "term": term, "seg": int(out_seg),
        "df_part": int(pdf["df_part"].sum()),
        "ttf_part": int(pdf["ttf_part"].sum()),
        "blocks": blocks,
    }])


def merge_segments(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    *,
    n_out: int = 1,
    salt: int = 4,
    conservative_impacts: bool = False,
) -> DataFrame:
    """Merge the index at ``src_dir`` into ``n_out`` doc-contiguous segments
    at ``dst_dir`` (query results are invariant — tested property)."""
    meta = IndexMeta.load(src_dir)
    layout = _load_seg_layout(spark, src_dir)
    n_in = len(layout)
    if n_out > n_in:
        raise ValueError(f"n_out={n_out} > input segments {n_in}")
    os.makedirs(dst_dir, exist_ok=True)

    # contiguous grouping: input segment rank r (by base) → out seg, salt slot
    ranks = {int(s): r for r, s in enumerate(layout.seg)}
    per_out = -(-n_in // n_out)         # ceil
    per_salt = max(1, -(-per_out // salt))

    def out_of(rank: int) -> tuple[int, int]:
        return rank // per_out, (rank % per_out) // per_salt

    in_bases = {int(s): int(b) for s, b in zip(layout.seg, layout.base)}
    out_seg_of = {int(s): out_of(ranks[int(s)])[0] for s in layout.seg}
    out_bases: dict[int, int] = {}
    for s in layout.seg:  # out base = min base of the group's segments
        o = out_seg_of[int(s)]
        out_bases[o] = min(out_bases.get(o, 1 << 62), in_bases[int(s)])

    mapping = pd.DataFrame({
        "in_seg": layout.seg.astype("int32"),
        "out_seg": [out_seg_of[int(s)] for s in layout.seg],
        "salt_g": [out_of(ranks[int(s)])[1] for s in layout.seg],
        "in_base": [in_bases[int(s)] for s in layout.seg],
        "out_base": [out_bases[out_seg_of[int(s)]] for s in layout.seg],
    })
    map_df = F.broadcast(spark.createDataFrame(mapping))

    norms_bc = None
    if not conservative_impacts:
        norms_bc = spark.sparkContext.broadcast(_load_global_norms(src_dir, layout))

    postings = (
        spark.read.parquet(os.path.join(src_dir, "postings"))
        .withColumnRenamed("seg", "in_seg")
        .join(map_df.select("in_seg", "out_seg", "salt_g"), "in_seg")
    )
    phase1 = postings.groupBy("term", "out_seg", "salt_g").applyInPandas(
        _phase1_kernel(norms_bc, meta.positions, in_bases, out_bases), PHASE1_SCHEMA
    )
    merged = phase1.groupBy("term", "seg").applyInPandas(_phase2_kernel, PHASE2_SCHEMA)
    (
        merged.repartitionByRange(n_out, "seg", "term")
        .sortWithinPartitions("seg", "term")
        .write.mode("overwrite").partitionBy("seg")
        .parquet(os.path.join(dst_dir, "postings"))
    )

    # --- docs table: remap seg + re-base the local ids ---
    docs = (
        spark.read.parquet(os.path.join(src_dir, "docs"))
        .withColumnRenamed("seg", "in_seg")
        .join(map_df.select("in_seg", "out_seg", "in_base", "out_base"), "in_seg")
        .withColumn("doc_local", F.col("doc_local") + F.col("in_base") - F.col("out_base"))
        .drop("in_seg", "in_base", "out_base")
        .withColumnRenamed("out_seg", "seg")
    )
    docs.write.mode("overwrite").partitionBy("seg").parquet(os.path.join(dst_dir, "docs"))

    # --- seg_norms: concat byte arrays per output segment ---
    def norms_kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (out_seg,) = key
        pdf = pdf.sort_values("base")
        return pd.DataFrame([{
            "seg": int(out_seg),
            "base": int(pdf["base"].iloc[0]),
            "n": int(pdf["n"].sum()),
            "norms": b"".join(pdf["norms"]),
        }])

    sn = (
        spark.read.parquet(os.path.join(src_dir, "seg_norms"))
        .withColumnRenamed("seg", "in_seg")
        .join(map_df.select("in_seg", "out_seg"), "in_seg")
    )
    (
        sn.groupBy("out_seg")
        .applyInPandas(norms_kernel, "seg int, base bigint, n bigint, norms binary")
        .write.mode("overwrite").partitionBy("seg")
        .parquet(os.path.join(dst_dir, "seg_norms"))
    )

    # --- global stats & meta are merge-invariant: copy through ---
    for tbl in ("stats", "term_stats"):
        spark.read.parquet(os.path.join(src_dir, tbl)).write.mode("overwrite").parquet(
            os.path.join(dst_dir, tbl)
        )
    with open(os.path.join(dst_dir, "meta.json"), "w") as f:
        json.dump({
            "analyzer": meta.analyzer, "key_cols": list(meta.key_cols),
            "text_col": meta.text_col, "positions": meta.positions,
            "n_segments": n_out, "version": meta.version,
        }, f)
    if norms_bc is not None:
        norms_bc.destroy()
    return spark.read.parquet(os.path.join(dst_dir, "postings"))
