"""Block-structured posting-list codec: delta + varint, 128-doc blocks,
per-block max-impact metadata.

Analog of the reference's ``L/codecs/lucene84/Lucene84PostingsWriter.java``
(doc/freq/pos streams, 128-doc blocks) + ``L/codecs/CompetitiveImpactAccumulator``
(per-block impacts) + ``Lucene84SkipWriter`` (per-block skip entries). The
north rule standardizes on delta+varint for all blocks (Lucene's vInt wire
format; FOR/PFOR bit-packing of full blocks is a physical-layer variant with
identical semantics).

One encoded block is a dict/Row with fields:

  first_doc  int64   first docID in block  (skip entry)
  last_doc   int64   last docID in block   (skip entry — enables block skipping)
  n          int32   postings in block (<= 128)
  max_tf     int32   max term frequency in block       ┐ impact pair: BM25 block
  min_norm   int32   min norm byte (≘ shortest doc)    ┘ max-score upper bound
  docs_bytes bytes   varint(delta(docIDs)), first delta vs first_doc (== 0)
  tfs_bytes  bytes   varint(tf per doc)
  pos_bytes  bytes   varint(per-doc position deltas, concatenated doc-major;
                     tfs give the per-doc split points)

Scoring monotonicity (BM25: ↑tf, ↓length; norm byte is monotone in length)
makes the single (max_tf, min_norm) pair a valid upper bound for any
(tf, norm) in the block — the per-block max-impact the north rule names.
"""

from __future__ import annotations

import numpy as np

from ..util.varint import decode_varints, encode_varints

BLOCK_SIZE = 128

# struct field order used everywhere (parquet schema + Row building)
BLOCK_FIELDS = (
    "first_doc", "last_doc", "n", "max_tf", "min_norm",
    "docs_bytes", "tfs_bytes", "pos_bytes",
)


def encode_posting_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    norms: np.ndarray,
    positions_flat: np.ndarray | None = None,
    block_size: int = BLOCK_SIZE,
) -> list[dict]:
    """Encode one term's postings (sorted by doc_id asc) into blocks.

    positions_flat: all positions doc-major (row i owns tfs[i] entries),
    or None to omit positions (DOCS_AND_FREQS index option).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.int64)
    n = len(doc_ids)
    blocks: list[dict] = []
    pos_splits = None
    if positions_flat is not None:
        positions_flat = np.asarray(positions_flat, dtype=np.int64)
        pos_splits = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tfs, out=pos_splits[1:])
    for start in range(0, n, block_size):
        end = min(start + block_size, n)
        d = doc_ids[start:end]
        t = tfs[start:end]
        deltas = np.diff(d, prepend=d[0])
        pos_bytes = b""
        if positions_flat is not None:
            p = positions_flat[pos_splits[start]:pos_splits[end]]
            if p.size:
                # per-doc delta coding: subtract previous position within doc
                pd_ = np.diff(p, prepend=np.int64(0))
                doc_starts = (pos_splits[start:end] - pos_splits[start])[t > 0]
                pd_[doc_starts] = p[doc_starts]  # first position per doc as-is
                pos_bytes = encode_varints(pd_)
        blocks.append({
            "first_doc": int(d[0]),
            "last_doc": int(d[-1]),
            "n": int(end - start),
            "max_tf": int(t.max()),
            "min_norm": int(norms[start:end].min()),
            "docs_bytes": encode_varints(deltas),
            "tfs_bytes": encode_varints(t),
            "pos_bytes": pos_bytes,
        })
    return blocks


def _get(block, field: str):
    """Field access for dicts and pyspark Rows alike."""
    if isinstance(block, dict):
        return block[field]
    return getattr(block, field)


def decode_block_docs(block) -> np.ndarray:
    """docIDs of one block (dict or pyspark Row)."""
    deltas = decode_varints(_get(block, "docs_bytes"))
    return np.cumsum(deltas) + np.int64(_get(block, "first_doc"))


def decode_block(block, with_positions: bool = False):
    """One block → (docs int64[], tfs int64[][, positions_flat int64[]]).

    positions_flat is doc-major; tfs give the per-doc splits.
    """
    docs = decode_block_docs(block)
    tfs = decode_varints(_get(block, "tfs_bytes"))
    if not with_positions:
        return docs, tfs
    pd_ = decode_varints(_get(block, "pos_bytes"))
    if pd_.size:
        # undo per-doc delta coding: cumsum within each doc's run
        splits = np.zeros(len(tfs) + 1, dtype=np.int64)
        np.cumsum(tfs, out=splits[1:])
        doc_starts = splits[:-1][tfs > 0]
        csum = np.cumsum(pd_)
        # positions = csum - (csum at previous doc boundary) + first-pos handled
        # by construction: pd_[doc_start] is absolute, later are deltas, so a
        # per-doc cumsum = global cumsum minus cumsum just before the doc start.
        prev = np.concatenate(([0], csum))[doc_starts]
        reps = np.diff(np.concatenate((doc_starts, [len(pd_)])))
        base = np.repeat(prev, reps)
        positions = csum - base
    else:
        positions = pd_
    return docs, tfs, positions


def decode_postings(blocks, with_positions: bool = False):
    """Concatenate decoded arrays across a term's block list."""
    if not blocks:
        empty = np.empty(0, dtype=np.int64)
        return (empty, empty.copy(), empty.copy()) if with_positions else (empty, empty.copy())
    parts = [decode_block(b, with_positions) for b in blocks]
    return tuple(np.concatenate(cols) for cols in zip(*parts))

