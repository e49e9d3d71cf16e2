"""Golden-file oracles for queries whose semantics aren't SQL-expressible.

The driver's correctness gate compares each Spark query against a DuckDB
oracle. Two registered queries (SYN image featurization, IVF approximate
top-k) can't be restated in SQL, so they were rows-only checks. This module
upgrades them to value-level oracles: an INDEPENDENT implementation — plain
numpy/Python over the parquet files read through DuckDB, no Spark and no
import of the operator modules under test — precomputes the expected result
into a golden parquet, and the oracle is ``SELECT ... FROM read_parquet``.

Exactness contract (why the compare can demand identical values):

- mm_image_features: every quantity is dyadic-exact. Pixels are uint8; the
  8-bin histogram is count/256; mean is sum/256; the variance's deviations
  are m/256 with m <= 2^16, their squares m^2/65536 with m^2 <= 2^32, and
  all partial sums stay under 2^53 — so every intermediate is an exact
  double regardless of summation order, and sqrt is correctly rounded. The
  histogram components are emitted as micro-units (floor(x*1e6 + 0.5) as
  integers, also exact) to avoid engine float formatting entirely.
- sim_topk_ivf: the final cosine is a SEQUENTIAL left-fold multiply-add
  chain (similarity/ann.dot_lit); the golden replays the same fold in
  Python doubles, which are the same IEEE-754 ops, and emits
  floor(cos*1e4 + 0.5) micro-units. The k-means coarse quantizer is
  replayed with the same deterministic algorithm (first-n seeds, Lloyd
  iterations, spherical argmax assignment); cell assignment is robust to
  sub-ulp centroid differences except at exact argmax ties, which the
  synthetic embeddings don't produce (verified by regeneration at every
  tested scale factor).

Golden files are regenerated on demand per scale-factor directory — they are
derived artifacts, safe to delete. The sf0.01 files are committed because
the driver's oracle SQL references them by absolute path.
"""

from __future__ import annotations

import math
import os
import struct

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
GOLDEN_DIR = os.path.join(_REPO, "tests", "data", "golden")

#: the sf dir the driver's oracle compare runs at (oracle SQL strings are
#: static, so they reference this sf's golden path)
DRIVER_SF_DIR = "/root/testdata/sf0.01"


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def golden_path(name: str, sf_dir: str) -> str:
    return os.path.join(GOLDEN_DIR, f"{name}_{_sf_name(sf_dir)}.parquet")


def fixture_fingerprint(sf_dir: str, table: str = "documents") -> tuple:
    """Cheap content fingerprint of one fixture table: (mtime_ns, size) summed
    over the file or the part files of a Spark-written directory. Used in
    memo keys (BPE training/replay) so a fixture REBUILT at the same path
    within one process (scale_probe then a sweep, or force-regenerated
    fixtures) invalidates the memo instead of serving stale results —
    mirroring how golden parquet files are invalidated."""
    p = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(p):
        mt = sz = 0
        for f in sorted(os.listdir(p)):
            st = os.stat(os.path.join(p, f))
            mt = max(mt, st.st_mtime_ns)
            sz += st.st_size
        return (mt, sz)
    if os.path.exists(p):
        st = os.stat(p)
        return (st.st_mtime_ns, st.st_size)
    return (0, 0)


def _write_parquet(path: str, table) -> None:
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _fetch(sf_dir: str, sql: str):
    import duckdb
    import re

    q = sql.format(sf=sf_dir)
    # Spark-written tables are DIRECTORIES of part files (scaled fixture
    # dirs from tools/scale_probe.py); glob them for DuckDB.
    q = re.sub(
        r"'([^']*\.parquet)'",
        lambda m: f"'{m.group(1)}/*.parquet'"
        if os.path.isdir(m.group(1)) else m.group(0),
        q,
    )
    con = duckdb.connect()
    try:
        return con.execute(q).fetchall()
    finally:
        con.close()


# --------------------------------------------------------------------------- #
# mm_image_features
# --------------------------------------------------------------------------- #

_MICRO6 = 1_000_000.0


def micro6(x: float) -> int:
    return int(math.floor(x * _MICRO6 + 0.5))


def ensure_mm_image_features(sf_dir: str, force: bool = False) -> str:
    """Golden for queries/multimodal_queries.mm_image_features: doc text ->
    256-pixel SYN image -> 8-bin histogram (micro-units) + mean/std."""
    import pyarrow as pa

    path = golden_path("mm_image_features", sf_dir)
    if os.path.exists(path) and not force:
        return path
    rows = _fetch(sf_dir, "SELECT doc_id, text FROM '{sf}/documents.parquet' ORDER BY doc_id")
    ids, feats, means, stds = [], [], [], []
    for doc_id, text in rows:
        raw = np.frombuffer(text.encode("utf-8")[:256], dtype=np.uint8)
        px = np.zeros(256, dtype=np.uint8)
        px[: len(raw)] = raw
        hist = np.bincount(px >> 5, minlength=8) / 256.0
        a = px.astype(np.float64)
        ids.append(int(doc_id))
        feats.append("|".join(str(micro6(h)) for h in hist))
        means.append(float(a.mean()))
        stds.append(float(a.std()))
    _write_parquet(
        path,
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "features_str": pa.array(feats, pa.string()),
                "mean_intensity": pa.array(means, pa.float64()),
                "std_intensity": pa.array(stds, pa.float64()),
            }
        ),
    )
    return path


# --------------------------------------------------------------------------- #
# sim_topk_ivf
# --------------------------------------------------------------------------- #


def _fold_dot(v, w) -> float:
    """The exact left-fold of similarity/ann.dot_lit: ((v0*w0 + v1*w1) + ...)."""
    acc = 0.0
    for x, y in zip(v, w):
        acc = acc + float(x) * float(y)
    return acc


def _cos_seq(v, q, qn: float) -> float:
    return _fold_dot(v, q) / (math.sqrt(_fold_dot(v, v)) * qn)


def ensure_sim_topk_ivf(
    sf_dir: str,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    kmeans_iter: int = 2,
    force: bool = False,
) -> str:
    """Golden for queries/similarity_queries.sim_topk_ivf: independent numpy
    replay of the IVF probe (same deterministic k-means: first-n seeds by id,
    spherical argmax assignment, mean update, empty cells keep previous)."""
    import pyarrow as pa

    path = golden_path("sim_topk_ivf", sf_dir)
    if os.path.exists(path) and not force:
        return path
    rows = _fetch(
        sf_dir,
        "SELECT vec_id, embedding FROM '{sf}/embeddings.parquet' ORDER BY vec_id",
    )
    qv = [float(x) for vid, emb in rows if vid == 0 for x in emb]
    data = [(int(vid), [float(x) for x in emb]) for vid, emb in rows if vid != 0]
    ids = [vid for vid, _ in data]
    x = np.array([v for _, v in data], dtype=np.float64)

    # k-means replay (same algorithm as similarity/ann.kmeans_centroids)
    cents = x[:n_centroids].copy()
    for _ in range(kmeans_iter):
        norms = np.linalg.norm(cents, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        assign = np.argmax(x @ (cents / norms).T, axis=1)
        new = cents.copy()
        for cid in range(n_centroids):
            members = x[assign == cid]
            if len(members):
                new[cid] = members.mean(axis=0)
        cents = new

    qn = math.sqrt(sum(float(v) * float(v) for v in qv))
    probe = sorted(
        range(n_centroids),
        key=lambda cid: -_cos_seq(cents[cid], qv, qn),
    )[:nprobe]
    norms = np.linalg.norm(cents, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    assign = np.argmax(x @ (cents / norms).T, axis=1)
    cands = [
        (vid, _cos_seq(vec, qv, qn))
        for (vid, vec), a in zip(data, assign)
        if a in set(probe)
    ]
    cands.sort(key=lambda t: (-t[1], t[0]))
    top = cands[:k]
    _write_parquet(
        path,
        pa.table(
            {
                "vec_id": pa.array([int(v) for v, _ in top], pa.int64()),
                "cos4": pa.array(
                    [int(math.floor(c * 1e4 + 0.5)) for _, c in top], pa.int64()
                ),
            }
        ),
    )
    return path




# --------------------------------------------------------------------------- #
# pq_codes
# --------------------------------------------------------------------------- #


def ensure_pq_codes(
    sf_dir: str,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 2,
    force: bool = False,
) -> str:
    """Golden for queries/similarity_queries.pq_codes: independent numpy
    replay of PQ training (first-ksub seeds by id, Lloyd means per subspace,
    empty clusters keep previous, lowest-index argmin ties) + encoding.
    Codes are integers, robust to sub-ulp centroid differences except at
    exact argmin ties, which the synthetic embeddings don't produce."""
    import pyarrow as pa

    path = golden_path("pq_codes", sf_dir)
    if os.path.exists(path) and not force:
        return path
    rows = _fetch(
        sf_dir,
        "SELECT vec_id, embedding FROM '{sf}/embeddings.parquet' ORDER BY vec_id",
    )
    ids = [int(vid) for vid, _ in rows]
    x = np.array([[float(v) for v in emb] for _, emb in rows], dtype=np.float64)
    dim = x.shape[1]
    dsub = dim // m
    books = np.ascontiguousarray(
        x[:ksub].reshape(ksub, m, dsub).transpose(1, 0, 2)
    )

    def codes_for(X, B):
        Xs = X.reshape(len(X), m, dsub)
        dots = np.einsum("nmd,mkd->nmk", Xs, B)
        cnorm = (B**2).sum(axis=2)
        return np.argmin(cnorm[None, :, :] - 2.0 * dots, axis=2)

    for _ in range(n_iter):
        codes = codes_for(x, books)
        new = books.copy()
        Xs = x.reshape(len(x), m, dsub)
        for s in range(m):
            for c in range(ksub):
                members = Xs[codes[:, s] == c, s]
                if len(members):
                    new[s, c] = members.mean(axis=0)
        books = new
    codes = codes_for(x, books)
    _write_parquet(
        path,
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "codes_str": pa.array(
                    ["-".join(str(int(c)) for c in row) for row in codes], pa.string()
                ),
            }
        ),
    )
    return path


# --------------------------------------------------------------------------- #
# mm_video_frames / mm_audio_features
# --------------------------------------------------------------------------- #


def ensure_mm_video_frames(sf_dir: str, force: bool = False) -> str:
    """Golden for mm_video_frames: doc text -> 4-frame 8x8 SYN video ->
    stride-2 frame sample -> per-frame mean (sum/64, dyadic-exact) and peak."""
    import pyarrow as pa

    path = golden_path("mm_video_frames", sf_dir)
    if os.path.exists(path) and not force:
        return path
    rows = _fetch(sf_dir, "SELECT doc_id, text FROM '{sf}/documents.parquet' ORDER BY doc_id")
    ids, fidx, means, peaks = [], [], [], []
    for doc_id, text in rows:
        raw = np.frombuffer(text.encode("utf-8")[:256], dtype=np.uint8)
        px = np.zeros(256, dtype=np.uint8)
        px[: len(raw)] = raw
        frames = px.reshape(4, 8, 8)
        for fi in range(0, 4, 2):
            f = frames[fi].astype(np.float64)
            ids.append(int(doc_id))
            fidx.append(fi)
            means.append(float(f.sum() / 64.0))
            peaks.append(int(f.max()))
    _write_parquet(
        path,
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "mean_intensity": pa.array(means, pa.float64()),
                "peak": pa.array(peaks, pa.int64()),
            }
        ),
    )
    return path


def ensure_mm_video_scenecut(
    sf_dir: str, threshold: float = 16.0, force: bool = False
) -> str:
    """Golden for mm_video_scenecut: doc text -> 4-frame 8x8 SYN video ->
    per-frame mean (sum/64, dyadic-exact) + frame-diff cut flag at a dyadic
    threshold — every comparison is between exact doubles."""
    import pyarrow as pa

    path = golden_path("mm_video_scenecut", sf_dir)
    if os.path.exists(path) and not force:
        return path
    rows = _fetch(sf_dir, "SELECT doc_id, text FROM '{sf}/documents.parquet' ORDER BY doc_id")
    ids, fidx, means, cuts = [], [], [], []
    for doc_id, text in rows:
        raw = np.frombuffer(text.encode("utf-8")[:256], dtype=np.uint8)
        px = np.zeros(256, dtype=np.uint8)
        px[: len(raw)] = raw
        frames = px.reshape(4, 8, 8).astype(np.float64)
        ms = frames.reshape(4, 64).sum(axis=1) / 64.0
        prev = None
        for fi, m in enumerate(ms):
            ids.append(int(doc_id))
            fidx.append(fi)
            means.append(float(m))
            cuts.append(prev is not None and abs(m - prev) > threshold)
            prev = m
    _write_parquet(
        path,
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "mean_intensity": pa.array(means, pa.float64()),
                "is_cut": pa.array(cuts, pa.bool_()),
            }
        ),
    )
    return path


def ensure_mm_audio_features(sf_dir: str, force: bool = False) -> str:
    """Golden for mm_audio_features: doc text -> 512-sample int16 SYN audio
    ((byte-128)*256), frame_len=128 -> 4 RMS values (micro-units) + peak.
    Every intermediate is an exact double (squares of k/2^15 summed over a
    power-of-two frame); sqrt is correctly rounded, so the replay is
    bit-identical."""
    import pyarrow as pa

    path = golden_path("mm_audio_features", sf_dir)
    if os.path.exists(path) and not force:
        return path
    rows = _fetch(sf_dir, "SELECT doc_id, text FROM '{sf}/documents.parquet' ORDER BY doc_id")
    ids, rms_strs, peaks = [], [], []
    for doc_id, text in rows:
        raw = np.frombuffer(text.encode("utf-8")[:512], dtype=np.uint8)
        b = np.zeros(512, dtype=np.uint8)
        b[: len(raw)] = raw
        samples = (b.astype(np.int16) - 128) * 256
        x = samples.astype(np.float64) / 32768.0
        frames = x.reshape(4, 128)
        rms = np.sqrt((frames**2).mean(axis=1))
        ids.append(int(doc_id))
        rms_strs.append("|".join(str(micro6(v)) for v in rms))
        peaks.append(float(np.abs(x).max()))
    _write_parquet(
        path,
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "rms_str": pa.array(rms_strs, pa.string()),
                "peak": pa.array(peaks, pa.float64()),
            }
        ),
    )
    return path


# --------------------------------------------------------------------------- #
# dedup_semantic
# --------------------------------------------------------------------------- #


def ensure_semantic_dedup(
    sf_dir: str,
    threshold: float = 0.4,
    n_clusters: int = 16,
    kmeans_iter: int = 2,
    force: bool = False,
) -> str:
    """Golden for queries/dedup_queries.dedup_semantic: independent numpy
    replay of SemDeDup — the same deterministic k-means as ensure_sim_topk_ivf
    (first-n seeds by id, spherical argmax assignment, mean update), then the
    per-cluster ascending-id greedy keep against the kept set. Outputs are an
    integer cluster id and a boolean — robust to sub-ulp float differences
    except at exact threshold/argmax ties, which the synthetic embeddings
    don't produce."""
    import pyarrow as pa

    path = golden_path("dedup_semantic", sf_dir)
    if os.path.exists(path) and not force:
        return path
    rows = _fetch(
        sf_dir,
        "SELECT vec_id, embedding FROM '{sf}/embeddings.parquet' ORDER BY vec_id",
    )
    ids = [int(vid) for vid, _ in rows]
    x = np.array([[float(v) for v in emb] for _, emb in rows], dtype=np.float64)

    cents = x[:n_clusters].copy()
    for _ in range(kmeans_iter):
        norms = np.linalg.norm(cents, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        assign = np.argmax(x @ (cents / norms).T, axis=1)
        new = cents.copy()
        for cid in range(n_clusters):
            members = x[assign == cid]
            if len(members):
                new[cid] = members.mean(axis=0)
        cents = new
    norms = np.linalg.norm(cents, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    assign = np.argmax(x @ (cents / norms).T, axis=1)

    xn = x / np.where(
        np.linalg.norm(x, axis=1, keepdims=True) == 0.0,
        1.0,
        np.linalg.norm(x, axis=1, keepdims=True),
    )
    keep = np.ones(len(ids), dtype=bool)
    for cid in range(n_clusters):
        rows_c = [i for i in range(len(ids)) if assign[i] == cid]  # id-sorted
        # Blocked greedy, mirroring dedup/semantic.py::prune — the
        # element-at-a-time form re-copies the kept matrix per element
        # (quadratic memory traffic), infeasible at 125k-member clusters.
        xc = xn[rows_c]
        buf = np.empty_like(xc)
        m = 0
        block = 2048
        for s in range(0, len(rows_c), block):
            e = min(s + block, len(rows_c))
            blk = xc[s:e]
            prior = (buf[:m] @ blk.T).max(axis=0) if m else None
            inner = blk @ blk.T
            loc: list[int] = []
            for j in range(e - s):
                hit = prior is not None and prior[j] >= threshold
                if not hit and loc:
                    hit = float(np.max(inner[loc, j])) >= threshold
                if hit:
                    keep[rows_c[s + j]] = False
                else:
                    loc.append(j)
            if loc:
                buf[m : m + len(loc)] = blk[loc]
                m += len(loc)
    _write_parquet(
        path,
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array([int(a) for a in assign], pa.int32()),
                "keep": pa.array([bool(k) for k in keep], pa.bool_()),
            }
        ),
    )
    return path


# --------------------------------------------------------------------------- #
# emb_pca_project
# --------------------------------------------------------------------------- #


def ensure_pca_project(
    sf_dir: str, k: int = 8, micro: int = 10_000, force: bool = False
) -> str:
    """Golden for queries/pipeline_queries.emb_pca_project: single-machine
    replay of the fixed-point PCA. The distributed accumulation under test
    sums int64 fixed-point moments, which are partition-order independent
    and exactly reproduced here; covariance/eigh/sign-normalization and the
    per-row fold projection then replay the identical IEEE operations."""
    import pyarrow as pa

    path = golden_path("emb_pca_project", sf_dir)
    if os.path.exists(path) and not force:
        return path
    rows = _fetch(
        sf_dir,
        "SELECT vec_id, embedding FROM '{sf}/embeddings.parquet' ORDER BY vec_id",
    )
    ids = [int(vid) for vid, _ in rows]
    x = np.array([[float(v) for v in emb] for _, emb in rows], dtype=np.float64)
    scale = float(1 << 20)
    xi = np.floor(x * scale + 0.5).astype(np.int64)
    n = len(xi)
    s = xi.sum(axis=0)
    g = xi.T @ xi
    mu = (s / scale) / n
    cov = (g / (scale * scale)) / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comp = v[:, order]
    for j in range(comp.shape[1]):
        i = int(np.argmax(np.abs(comp[:, j])))
        if comp[i, j] < 0:
            comp[:, j] = -comp[:, j]
    pcs = []
    for row in x:
        c = row - mu
        out_row = []
        for j in range(comp.shape[1]):
            acc = 0.0
            col = comp[:, j]
            for t in range(len(c)):
                acc += c[t] * col[t]
            out_row.append(int(math.floor(acc * float(micro) + 0.5)))
        pcs.append("|".join(str(p) for p in out_row))
    _write_parquet(
        path,
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "pc_str": pa.array(pcs, pa.string()),
            }
        ),
    )
    return path


# --------------------------------------------------------------------------- #
# text_bpe_merges / text_bpe_encode
# --------------------------------------------------------------------------- #

_BPE_MERGES = 24
_BPE_MIN_FREQ = 2


_BPE_REPLAY_MEMO: dict = {}


def _bpe_replay(sf_dir: str, num_merges: int, min_freq: int):
    """Independent pure-Python BPE replay (no Spark, no import of text/bpe.py):
    lowercase [^a-z0-9]+ word split, overlapping adjacent-pair counts weighted
    by word freq, ties (n desc, left asc, right asc), greedy left-to-right
    merge application. All counts are integers — engine-exact.

    Memoized per (sf_dir, num_merges, min_freq): ensure_bpe_merges and
    ensure_bpe_encode both replay the identical training run, and at scaled
    fixture dirs (50k+ docs whose per-replica cipher shrinks the space
    frequency, producing hundred-char words) one replay is ~100 s.
    """
    import collections
    import re

    memo_key = (
        os.path.normpath(sf_dir),
        fixture_fingerprint(sf_dir),
        num_merges,
        min_freq,
    )
    if memo_key in _BPE_REPLAY_MEMO:
        return _BPE_REPLAY_MEMO[memo_key]

    rows = _fetch(sf_dir, "SELECT text FROM '{sf}/documents.parquet'")
    splitter = re.compile("[^a-z0-9]+")
    wc: collections.Counter = collections.Counter()
    for (text,) in rows:
        for w in splitter.split(str(text).lower()):
            if w:
                wc[w] += 1
    words = [[list(w), f] for w, f in wc.items()]
    merges = []
    for rank in range(num_merges):
        cnt: collections.Counter = collections.Counter()
        for syms, f in words:
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += f
        if not cnt:
            break
        (left, right), n = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_freq:
            break
        merges.append((rank, left, right, int(n)))
        for item in words:
            syms, out, i = item[0], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            item[0] = out
    _BPE_REPLAY_MEMO[memo_key] = (merges, splitter)
    return merges, splitter


def ensure_bpe_merges(sf_dir: str, force: bool = False) -> str:
    """Golden for queries/text_queries.text_bpe_merges."""
    import pyarrow as pa

    path = golden_path("text_bpe_merges", sf_dir)
    if os.path.exists(path) and not force:
        return path
    merges, _ = _bpe_replay(sf_dir, _BPE_MERGES, _BPE_MIN_FREQ)
    _write_parquet(
        path,
        pa.table(
            {
                "rank": pa.array([m[0] for m in merges], pa.int64()),
                "lhs": pa.array([m[1] for m in merges], pa.string()),
                "rhs": pa.array([m[2] for m in merges], pa.string()),
                "n": pa.array([m[3] for m in merges], pa.int64()),
            }
        ),
    )
    return path


def ensure_bpe_encode(sf_dir: str, force: bool = False) -> str:
    """Golden for queries/text_queries.text_bpe_encode: per-doc token count
    and the first 12 tokens, encoded with the replayed merge list."""
    import pyarrow as pa

    path = golden_path("text_bpe_encode", sf_dir)
    if os.path.exists(path) and not force:
        return path
    merges, splitter = _bpe_replay(sf_dir, _BPE_MERGES, _BPE_MIN_FREQ)
    pairs = [(left, right) for _, left, right, _ in merges]

    cache: dict[str, list[str]] = {}

    def enc_word(w: str) -> list[str]:
        toks = cache.get(w)
        if toks is None:
            syms = list(w)
            for left, right in pairs:
                if len(syms) < 2:
                    break
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[w] = toks = syms
        return toks

    rows = _fetch(sf_dir, "SELECT doc_id, text FROM '{sf}/documents.parquet' ORDER BY doc_id")
    ids, ntok, heads = [], [], []
    for doc_id, text in rows:
        toks: list[str] = []
        for w in splitter.split(str(text).lower()):
            if w:
                toks.extend(enc_word(w))
        ids.append(int(doc_id))
        ntok.append(len(toks))
        heads.append("|".join(toks[:12]))
    _write_parquet(
        path,
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "head_tokens": pa.array(heads, pa.string()),
            }
        ),
    )
    return path


def ensure_driver_goldens() -> None:
    """Generate the goldens the static oracle SQL references (driver sf)."""
    if os.path.isdir(DRIVER_SF_DIR):
        try:
            ensure_mm_image_features(DRIVER_SF_DIR)
            ensure_sim_topk_ivf(DRIVER_SF_DIR)
            ensure_pq_codes(DRIVER_SF_DIR)
            ensure_mm_video_frames(DRIVER_SF_DIR)
            ensure_mm_audio_features(DRIVER_SF_DIR)
            ensure_bpe_merges(DRIVER_SF_DIR)
            ensure_bpe_encode(DRIVER_SF_DIR)
            ensure_semantic_dedup(DRIVER_SF_DIR)
            ensure_mm_video_scenecut(DRIVER_SF_DIR)
            ensure_pca_project(DRIVER_SF_DIR)
        except Exception:  # never break registry import on golden failure
            pass
