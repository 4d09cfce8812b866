"""Multimodal columns: image / audio / video as opaque ``binary`` payloads
with typed metadata, processed by ACTOR-POOL ``map_batches`` stages.

The container has no image/audio libraries, so the codec layer is split:

- ``RealCodec`` — used automatically when ``PIL`` is importable; otherwise
  every real decode raises ``NotImplementedError`` (clearly marked STUB
  boundary, per the build brief).
- ``FakeCodec`` — deterministic stand-in for tests/bench: payloads generated
  by ``synth_media`` carry a tiny self-describing header
  (``FIMG``/``FAUD``/``FVID`` + packed metadata), so decode/resize/
  frame-sample are real Arrow-shaped transforms with fake pixels.

The RAY side is fully real: schema (``media_ref: string, kind: string,
payload: binary``), stateful actor construction (codec chosen once per actor
in ``__init__``), batch-size guidance for large binaries (payloads make
rows heavy — size ``batch_size`` so batch x concurrency fits the heap), and
flat_map-style row expansion for frame sampling.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash_str

MEDIA_SCHEMA = pa.schema(
    [("media_ref", pa.string()), ("kind", pa.string()), ("payload", pa.binary())]
)


# ---------------------------------------------------------------- synthesis
def synth_media(registry_path: str, *, max_body: int = 4096) -> pa.Table:
    """Deterministic fake media payloads for every registry row. Header
    formats:  FIMG + u16 width + u16 height + u8 channels;
              FAUD + u32 duration_ms + u16 sample_rate;
              FVID + u16 n_frames + u16 frame_bytes."""
    import pyarrow.parquet as pq

    reg = pq.read_table(registry_path)
    refs = reg["media_ref"].to_numpy(zero_copy_only=False)
    kinds = reg["kind"].to_numpy(zero_copy_only=False)
    h = hash_str(refs)
    payloads = []
    out_kinds = []
    for i, (r, k) in enumerate(zip(refs, kinds)):
        x = int(h[i])
        body = (x.to_bytes(8, "little") * ((max_body // 8) + 1))[: 64 + x % max_body]
        if k == "image":
            w, ht, c = 16 + x % 1024, 16 + (x >> 10) % 1024, 1 + x % 4
            payloads.append(b"FIMG" + struct.pack("<HHB", w, ht, c) + body)
            out_kinds.append("image")
        elif k == "audio":
            dur, rate = 100 + x % 600_000, 8000 + (x % 5) * 8000
            payloads.append(b"FAUD" + struct.pack("<IH", dur, rate) + body)
            out_kinds.append("audio")
        else:
            nf, fb = 1 + x % 64, 16 + (x >> 6) % 240
            frames = (body * ((nf * fb) // max(len(body), 1) + 1))[: nf * fb]
            payloads.append(b"FVID" + struct.pack("<HH", nf, fb) + frames)
            out_kinds.append("video")
    return pa.table(
        {
            "media_ref": pa.array(refs, pa.string()),
            "kind": pa.array(out_kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


# ------------------------------------------------------------------- codecs
class FakeCodec:
    """Parses the synth headers. Deterministic; no pixel work."""

    def image_meta(self, payload: bytes) -> tuple[int, int, int]:
        if payload[:4] != b"FIMG":
            raise ValueError("not a fake image payload")
        w, h, c = struct.unpack_from("<HHB", payload, 4)
        return w, h, c

    def image_resize(self, payload: bytes, w: int, h: int) -> bytes:
        _, _, c = self.image_meta(payload)
        body = payload[9:]
        need = max(w * h // 64, 1)
        out = (body * (need // max(len(body), 1) + 1))[:need]
        return b"FIMG" + struct.pack("<HHB", w, h, c) + out

    def audio_meta(self, payload: bytes) -> tuple[int, int]:
        if payload[:4] != b"FAUD":
            raise ValueError("not a fake audio payload")
        return struct.unpack_from("<IH", payload, 4)

    def video_frames(self, payload: bytes) -> list[bytes]:
        if payload[:4] != b"FVID":
            raise ValueError("not a fake video payload")
        nf, fb = struct.unpack_from("<HH", payload, 4)
        body = payload[8:]
        return [body[i * fb:(i + 1) * fb] for i in range(nf)]

    def image_thumb64(self, payload: bytes) -> np.ndarray:
        """8x8 grayscale 'thumbnail' = the first 64 decoded pixel bytes
        (the body tiles the 8-byte source hash, so the oracle recomputes
        every pixel from hash_str(media_ref) in SQL)."""
        if payload[:4] != b"FIMG":
            raise ValueError("not a fake image payload")
        return np.frombuffer(payload, dtype=np.uint8, count=64, offset=9).copy()

    def audio_frame64(self, payload: bytes) -> np.ndarray:
        """First 64 decoded sample bytes (body starts after the 10-byte
        FAUD header) — same oracle-recomputable property as the thumbnail."""
        if payload[:4] != b"FAUD":
            raise ValueError("not a fake audio payload")
        return np.frombuffer(payload, dtype=np.uint8, count=64, offset=10).copy()


class RealCodec:
    """Real decode via PIL/ffmpeg — NOT AVAILABLE in this container.

    STUB: every method raises NotImplementedError unless PIL imports. The
    actor plumbing (construction, batching, schemas) is identical to the
    fake path, so swapping in the real codec is a one-line change where the
    libraries exist."""

    def __init__(self):
        try:
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def image_meta(self, payload: bytes):
        if self._pil is None:
            raise NotImplementedError("real image decode requires PIL (not in container)")
        import io

        with self._pil.open(io.BytesIO(payload)) as im:
            return im.width, im.height, len(im.getbands())

    def image_resize(self, payload: bytes, w: int, h: int):
        if self._pil is None:
            raise NotImplementedError("real image resize requires PIL (not in container)")
        import io

        with self._pil.open(io.BytesIO(payload)) as im:
            buf = io.BytesIO()
            im.resize((w, h)).save(buf, format=im.format or "PNG")
            return buf.getvalue()

    def image_thumb64(self, payload: bytes) -> np.ndarray:
        if self._pil is None:
            raise NotImplementedError("real image decode requires PIL (not in container)")
        import io

        with self._pil.open(io.BytesIO(payload)) as im:
            thumb = im.convert("L").resize((8, 8))
            return np.asarray(thumb, dtype=np.uint8).reshape(64)

    def audio_meta(self, payload: bytes):
        raise NotImplementedError("real audio decode requires ffmpeg (not in container)")

    def audio_frame64(self, payload: bytes):
        raise NotImplementedError("real audio decode requires ffmpeg (not in container)")

    def video_frames(self, payload: bytes):
        raise NotImplementedError("real video decode requires ffmpeg (not in container)")


def _pick_codec(codec: str):
    if codec == "fake":
        return FakeCodec()
    rc = RealCodec()
    return rc if rc._pil is not None else FakeCodec() if codec == "auto" else rc


# -------------------------------------------------------------- actor stages
class ImageMetaStage:
    """Actor: decode image metadata. Codec chosen ONCE per actor."""

    def __init__(self, codec: str = "auto"):
        self.codec = _pick_codec(codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()  # one materialization per batch
        metas = [self.codec.image_meta(p) for p in payloads]
        w, h, c = (np.array(x, dtype=np.int64) for x in zip(*metas)) if metas else (
            np.empty(0, np.int64),) * 3
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "width": pa.array(w),
                "height": pa.array(h),
                "channels": pa.array(c),
                "payload_bytes": pa.array(
                    np.array([len(p) for p in payloads], dtype=np.int64)
                ),
            }
        )


class ImageResizeStage:
    def __init__(self, width: int, height: int, codec: str = "auto"):
        self.w, self.h = width, height
        self.codec = _pick_codec(codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self.codec.image_resize(p, self.w, self.h)
               for p in batch["payload"].to_pylist()]
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "kind": batch["kind"],
                "payload": pa.array(out, pa.binary()),
            },
            schema=MEDIA_SCHEMA,
        )


class AudioMetaStage:
    def __init__(self, codec: str = "auto"):
        self.codec = _pick_codec(codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [self.codec.audio_meta(p) for p in batch["payload"].to_pylist()]
        dur, rate = (np.array(x, dtype=np.int64) for x in zip(*metas)) if metas else (
            np.empty(0, np.int64),) * 2
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "duration_ms": pa.array(dur),
                "sample_rate": pa.array(rate),
                "n_samples": pa.array(dur * rate // 1000),
            }
        )


class FrameSampleStage:
    """Actor: sample every k-th video frame; expands one row per frame."""

    def __init__(self, every_k: int = 4, codec: str = "auto"):
        self.k = every_k
        self.codec = _pick_codec(codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, idxs, frames = [], [], []
        for r, p in zip(batch["media_ref"].to_pylist(), batch["payload"].to_pylist()):
            fr = self.codec.video_frames(p)
            for i in range(0, len(fr), self.k):
                refs.append(r)
                idxs.append(i)
                frames.append(fr[i])
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "frame_index": pa.array(np.array(idxs, dtype=np.int64)),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def synth_media_parquet(registry_path: str, *, max_body: int = 4096) -> str:
    """Write (once, cached, atomic) the synth media table as parquet next to
    the fixture registry — so the media entry point READS A FILE and streams,
    the layout users copy for real media lakes."""
    import os

    import pyarrow.parquet as pq

    out = os.path.join(os.path.dirname(registry_path), "media.parquet")
    if not os.path.exists(out):
        tmp = out + f".tmp.{os.getpid()}"
        pq.write_table(synth_media(registry_path, max_body=max_body), tmp)
        try:
            os.rename(tmp, out)
        except OSError:
            os.unlink(tmp)  # another process won the race
    return out


_VARIANTS_VERSION = "v2"  # bump when generated variant content changes


def synth_media_variants(registry_path: str, *, max_body: int = 4096) -> pa.Table:
    """Image + audio media table WITH near-duplicate twins: every image and
    audio row from the registry, plus — for rows with even hash — a
    ``<ref>~d`` twin whose payload perturbs two decoded bytes (``255 - x``
    at body positions ``h % 64`` and ``(h >> 6) % 64``). Twins land within
    a few signature bits of their base, so the perceptual-hash /
    fingerprint dedups have real positives; every byte is a pure function
    of ``hash_str(media_ref)``, so the DuckDB oracle recomputes both
    signatures exactly."""
    import pyarrow.parquet as pq

    reg = pq.read_table(registry_path)
    kinds_all = reg["kind"].to_numpy(zero_copy_only=False)
    mask = np.asarray((kinds_all == "image") | (kinds_all == "audio"))
    refs = reg["media_ref"].to_numpy(zero_copy_only=False)[mask]
    kinds = kinds_all[mask]
    h = hash_str(refs.astype("U"))
    out_refs, out_kinds, payloads = [], [], []
    for i, (r, k) in enumerate(zip(refs, kinds)):
        x = int(h[i])
        body = (x.to_bytes(8, "little") * ((max_body // 8) + 1))[: 64 + x % max_body]
        if k == "image":
            w, ht, c = 16 + x % 1024, 16 + (x >> 10) % 1024, 1 + x % 4
            head = b"FIMG" + struct.pack("<HHB", w, ht, c)
        else:
            dur, rate = 100 + x % 600_000, 8000 + (x % 5) * 8000
            head = b"FAUD" + struct.pack("<IH", dur, rate)
        out_refs.append(str(r))
        out_kinds.append(str(k))
        payloads.append(head + body)
        if x % 2 == 0:
            tb = bytearray(body)
            for p in (x % 64, (x >> 6) % 64):
                tb[p] = 255 - tb[p]
            out_refs.append(f"{r}~d")
            out_kinds.append(str(k))
            payloads.append(head + bytes(tb))
    return pa.table(
        {
            "media_ref": pa.array(out_refs, pa.string()),
            "kind": pa.array(out_kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


def synth_media_variants_parquet(registry_path: str) -> str:
    """Write (once, cached, atomic) the variants table beside the fixture
    registry, like ``synth_media_parquet`` (version-stamped filename so a
    generation change never reads a stale cache)."""
    import os

    import pyarrow.parquet as pq

    out = os.path.join(os.path.dirname(registry_path),
                       f"media_variants-{_VARIANTS_VERSION}.parquet")
    if not os.path.exists(out):
        tmp = out + f".tmp.{os.getpid()}"
        pq.write_table(synth_media_variants(registry_path), tmp)
        try:
            os.rename(tmp, out)
        except OSError:
            os.unlink(tmp)
    return out


# round-3 names kept for the image-only call sites
synth_image_variants = synth_media_variants
synth_image_variants_parquet = synth_media_variants_parquet


def ahash_bits(thumbs: np.ndarray) -> np.ndarray:
    """(n, 64) uint8 thumbnails -> uint64 average-hash signatures:
    bit i = 64 * px[i] >= sum(px) (integer mean comparison, no division)."""
    t = thumbs.astype(np.int64)
    bits = (64 * t) >= t.sum(axis=1, keepdims=True)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)


class PHashStage:
    """Actor: decode image payloads -> 64-bit perceptual hash (aHash over
    the 8x8 grayscale thumbnail). Codec chosen ONCE per actor; the hash
    fold itself is one vectorized pass over the stacked thumbnails."""

    def __init__(self, codec: str = "auto"):
        self.codec = _pick_codec(codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        thumbs = (
            np.stack([self.codec.image_thumb64(p) for p in payloads])
            if payloads else np.empty((0, 64), np.uint8)
        )
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "sig": pa.array(ahash_bits(thumbs).astype(np.int64)),
            }
        )


def hamming_band_pairs(sigs, *, max_hamming: int = 3):
    """Generic banded Hamming near-dup search over a
    Dataset[media_ref: string, sig: int64]: 4x16-bit pigeonhole banding
    grouped by the packed (band << 16 | band_hash) key — each exchange
    group bounded by the refs sharing one 16-bit band value — with exact
    Hamming verification on the full signatures. Shared by the image
    (aHash) and audio (fingerprint) near-dup lanes. Returns
    (ref_a, ref_b), ref_a < ref_b lexicographically."""
    from .dedup import _expand_run_pairs

    def band_rows(t: pa.Table) -> pa.Table:
        sig = np.asarray(t["sig"]).view(np.uint64)
        refs = t["media_ref"]
        if isinstance(refs, pa.ChunkedArray):
            refs = refs.combine_chunks()
        bkeys, refs_out, sig_out = [], [], []
        for b in range(4):
            bh = ((sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            bkeys.append(np.int64(b << 16) | bh)
            refs_out.append(refs)
            sig_out.append(sig.astype(np.int64))
        return pa.table(
            {
                "bkey": pa.array(np.concatenate(bkeys)),
                "media_ref": pa.concat_arrays([r for r in refs_out]),
                "sig": pa.array(np.concatenate(sig_out)),
            }
        )

    def pairs(g: pa.Table) -> pa.Table:
        bkey = np.asarray(g["bkey"])
        refs = g["media_ref"].to_numpy(zero_copy_only=False).astype("U")
        sig = np.asarray(g["sig"]).view(np.uint64)
        order = np.lexsort((refs, bkey))
        bk_s, r_s, sig_s = bkey[order], refs[order], sig[order]
        run_id = np.zeros(len(bk_s), dtype=np.int64)
        run_id[1:] = np.cumsum(bk_s[1:] != bk_s[:-1])
        pos_a, pos_b = _expand_run_pairs(run_id)
        if len(pos_a) == 0:
            return pa.table({"ref_a": pa.array([], pa.string()),
                             "ref_b": pa.array([], pa.string())})
        x = sig_s[pos_a] ^ sig_s[pos_b]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        ok = ham <= max_hamming  # refs ascending per run -> a < b strictly
        return pa.table({"ref_a": pa.array(r_s[pos_a][ok], pa.string()),
                         "ref_b": pa.array(r_s[pos_b][ok], pa.string())})

    def pair_bucket(t: pa.Table) -> pa.Table:
        a = t["ref_a"]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        hb = hash_str(a.to_numpy(zero_copy_only=False).astype("U"))
        return t.append_column("pbucket", pa.array((hb % np.uint64(32)).astype(np.int32)))

    def dedup_pairs(g: pa.Table) -> pa.Table:
        a = g["ref_a"].to_numpy(zero_copy_only=False).astype("U")
        b = g["ref_b"].to_numpy(zero_copy_only=False).astype("U")
        combo = np.char.add(np.char.add(a, "\x1f"), b)
        _, idx = np.unique(combo, return_index=True)
        return pa.table({"ref_a": pa.array(a[idx], pa.string()),
                         "ref_b": pa.array(b[idx], pa.string())})

    return (
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby("bkey")
        .map_groups(pairs, batch_format="pyarrow")
        .map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(dedup_pairs, batch_format="pyarrow")
        .select_columns(["ref_a", "ref_b"])
    )


def phash_dups(media_parquet: str, *, max_hamming: int = 3,
               concurrency: int = 2, batch_size: int = 64):
    """Image near-duplicate pairs by perceptual hash: stream the media
    table, actor-pool decode -> aHash, then ``hamming_band_pairs``.

    Cites the reference's dedup ladder (SURVEY §2.8) extended to the media
    payload lane; the codec boundary is the documented stub
    (``RealCodec.image_thumb64`` is the PIL path where importable)."""
    import ray.data as rd

    sigs = (
        rd.read_parquet(media_parquet)
        .filter(expr="kind == 'image'")
        .map_batches(
            PHashStage,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    )
    return hamming_band_pairs(sigs, max_hamming=max_hamming)


class AudioFingerprintStage:
    """Actor: decode audio payloads -> 64-bit fingerprint. The fake-codec
    lane folds the first 64 decoded sample bytes through the same
    integer-mean bit rule as the image aHash (a Chromaprint-style spectral
    fingerprint slots in behind the same signature contract where real
    audio libs exist — the documented codec stub boundary)."""

    def __init__(self, codec: str = "auto"):
        self.codec = _pick_codec(codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        frames = (
            np.stack([self.codec.audio_frame64(p) for p in payloads])
            if payloads else np.empty((0, 64), np.uint8)
        )
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "sig": pa.array(ahash_bits(frames).astype(np.int64)),
            }
        )


def audio_fingerprint_dups(media_parquet: str, *, max_hamming: int = 3,
                           concurrency: int = 2, batch_size: int = 64):
    """Audio near-duplicate pairs by waveform fingerprint — the audio
    sibling of ``phash_dups`` over the same banded Hamming exchange."""
    import ray.data as rd

    sigs = (
        rd.read_parquet(media_parquet)
        .filter(expr="kind == 'audio'")
        .map_batches(
            AudioFingerprintStage,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    )
    return hamming_band_pairs(sigs, max_hamming=max_hamming)


def media_pipeline(source: str, *, kind: str, stage, concurrency: int = 2,
                   batch_size: int = 64, streaming: bool = True):
    """Media table -> filter kind -> actor-pool stage.

    ``source`` is a fixture registry path (``registry.parquet``): the synth
    media table is materialized to parquet ONCE beside it and then
    ``read_parquet``-streamed — blocks flow through the object store with
    backpressure, nothing corpus-sized is built on the driver (a production
    media lake swaps in its own parquet path at the same spot).
    ``streaming=False`` keeps the in-memory ``from_arrow`` lane for tiny
    ad-hoc tables. Small batch_size: binary payloads make rows heavy
    (batch x concurrency must fit the heap)."""
    import ray.data as rd

    if streaming:
        media = rd.read_parquet(synth_media_parquet(source))
    else:
        media = rd.from_arrow(synth_media(source))
    sub = media.filter(expr=f"kind == '{kind}'")
    cls, kwargs = stage
    return sub.map_batches(
        cls,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ------------------------------------------------------- cross-modal retrieval
# Text-query -> media top-k through a SHARED integer embedding space: media
# payloads decode (actor pool) to a caption-token bridge string — the
# quantized-metadata stand-in for a real joint encoder's caption tower —
# and both sides embed with textops.hash_embed's FNV word fold, so the
# whole retrieval path (decode -> caption -> embed -> broadcast-query
# matmul -> two-level top-k fold) is exactly SQL-checkable. Swapping a real
# CLIP-style encoder in is a one-stage change (CaptionEmbedStage keeps the
# actor signature); the Ray-side plumbing is the deliverable.

CM_DIM = 8
# queries live in the caption-token vocabulary (w/h buckets 0-4 = dim//256,
# channels 1-4)
CM_QUERIES = (
    "image w0 h0 c1", "image w1 h2 c3", "image w2 h1 c2",
    "image w3 h3 c4", "image w4 h0 c2",
)


def caption_text(w: int, h: int, c: int) -> str:
    """Quantized caption-token bridge for an image: buckets of 256px."""
    return f"image w{w // 256} h{h // 256} c{c}"


def embed_text(text: str, dim: int = CM_DIM) -> np.ndarray:
    """Driver-side single-string twin of ``textops.hash_embed``: component
    j = sum over words of FNV(word + '#j') % 15 - 7."""
    words = np.array([w for w in text.split(" ") if w], dtype="U")
    vec = np.zeros(dim, dtype=np.int64)
    if words.size == 0:
        return vec
    for j in range(dim):
        vals = (hash_str(np.char.add(words, f"#{j}"))
                % np.uint64(15)).astype(np.int64) - 7
        vec[j] = int(vals.sum())
    return vec


class CaptionStage:
    """Actor: image payload -> (doc_id=media_ref, text=caption tokens)."""

    def __init__(self, codec: str = "auto"):
        self.codec = _pick_codec(codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [self.codec.image_meta(p) for p in batch["payload"].to_pylist()]
        caps = [caption_text(w, h, c) for (w, h, c) in metas]
        return pa.table({"doc_id": batch["media_ref"],
                         "text": pa.array(caps, pa.string())})


def _merge_cm_topk(t: pa.Table, k: int) -> pa.Table:
    """(query_id, media_ref, score) candidates -> <= k rows per query,
    deterministic ties (score DESC, media_ref ASC), cross-batch (query,
    ref) dups collapsed. Serves as per-task combine AND final merge."""
    q = np.asarray(t["query_id"]).astype(np.int64)
    r = t["media_ref"].to_numpy(zero_copy_only=False).astype("U")
    s = np.asarray(t["score"]).astype(np.int64)
    order = np.lexsort((r, -s, q))
    q, r, s = q[order], r[order], s[order]
    keep_first = np.ones(len(q), dtype=bool)
    if len(q) > 1:
        keep_first[1:] = (q[1:] != q[:-1]) | (r[1:] != r[:-1])
    q, r, s = q[keep_first], r[keep_first], s[keep_first]
    new_q = np.ones(len(q), dtype=bool)
    new_q[1:] = q[1:] != q[:-1]
    starts = np.flatnonzero(new_q)
    rank = (np.arange(len(q))
            - np.repeat(starts, np.diff(np.append(starts, len(q)))) + 1)
    keep = rank <= k
    return pa.table({
        "query_id": pa.array(q[keep]),
        "media_ref": pa.array(r[keep].tolist(), pa.string()),
        "score": pa.array(s[keep]),
        "rank": pa.array(rank[keep].astype(np.int64)),
    })


def crossmodal_topk(registry_path: str, *, queries=CM_QUERIES, k: int = 5,
                    dim: int = CM_DIM, streaming: bool = True):
    """Text-to-image retrieval: exact integer-dot top-k per query over the
    caption-bridge embeddings. The query matrix broadcasts ONCE via
    ``ray.put``; media stream through decode -> caption -> embed -> a
    stateless per-batch matmul; candidates fold two-level (per-task combine
    then a <= n_tasks x nq x k driver merge) like ``similarity._fold_topk``.

    Returns Dataset[query_id, media_ref, score, rank] (rank 1-based,
    ties score DESC then media_ref ASC)."""
    import ray
    import ray.data as rd

    from ..functions.collect import collect_table
    from .textops import hash_embed

    caps = media_pipeline(registry_path, kind="image",
                          stage=(CaptionStage, {}), streaming=streaming)
    emb = hash_embed(caps, dim=dim)
    qm = np.stack([embed_text(q, dim) for q in queries])  # (nq, dim)
    q_ref = ray.put(qm)

    def local_topk(t: pa.Table) -> pa.Table:
        m = ray.get(q_ref) if not isinstance(q_ref, np.ndarray) else q_ref
        n = t.num_rows
        e = np.stack([np.asarray(t[f"e{j}"], dtype=np.int64)
                      for j in range(dim)], axis=1) if n else np.zeros((0, dim), np.int64)
        scores = e @ m.T  # (n, nq) int64
        kk = min(k, n)
        refs = t["doc_id"].to_numpy(zero_copy_only=False)
        qs, rs, ss = [], [], []
        for qi in range(len(m)):
            col = scores[:, qi]
            idx = (np.argpartition(-col, kk - 1)[:kk]
                   if 0 < kk < n else np.arange(n))
            qs.append(np.full(len(idx), qi, dtype=np.int64))
            rs.append(refs[idx])
            ss.append(col[idx])
        return pa.table({
            "query_id": pa.array(np.concatenate(qs) if qs else
                                 np.empty(0, np.int64)),
            "media_ref": pa.array(np.concatenate(rs).tolist() if rs else [],
                                  pa.string()),
            "score": pa.array(np.concatenate(ss) if ss else
                              np.empty(0, np.int64)),
        })

    cand = emb.map_batches(local_topk, batch_format="pyarrow")
    combined = cand.map_batches(
        lambda t: _merge_cm_topk(t, k), batch_format="pyarrow",
        batch_size=max(4096, 64 * len(queries) * k),
    )
    schema = pa.schema([("query_id", pa.int64()), ("media_ref", pa.string()),
                        ("score", pa.int64()), ("rank", pa.int64())])
    tbl = collect_table(combined, empty_schema=schema)
    if tbl.num_rows == 0 or tbl.num_columns == 0:
        return rd.from_arrow(pa.table({c: pa.array([], t) for c, t in
                                       zip(schema.names, schema.types)}))
    return rd.from_arrow(_merge_cm_topk(tbl, k))


SCENE_CUT_THRESHOLD = 32
SCENE_SIG_BYTES = 16


class SceneCutStage:
    """Actor: video scene-boundary detection — per-frame signature (sum of
    the first ``SCENE_SIG_BYTES`` decoded bytes; a real pipeline plugs a
    luma-histogram or pHash here at the same codec boundary) and a cut
    wherever the absolute signature delta between consecutive frames
    exceeds ``threshold``. The standard segmentation step between frame
    sampling and per-scene feature extraction. One row per video:
    (media_ref, n_frames, n_cuts)."""

    def __init__(self, threshold: int = SCENE_CUT_THRESHOLD,
                 codec: str = "auto"):
        self.threshold = threshold
        self.codec = _pick_codec(codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, n_frames, n_cuts = [], [], []
        for r, p in zip(batch["media_ref"].to_pylist(),
                        batch["payload"].to_pylist()):
            fr = self.codec.video_frames(p)
            sigs = np.array(
                [int(np.frombuffer(f[:SCENE_SIG_BYTES], dtype=np.uint8)
                     .astype(np.int64).sum()) for f in fr],
                dtype=np.int64)
            refs.append(r)
            n_frames.append(len(fr))
            n_cuts.append(int((np.abs(np.diff(sigs)) > self.threshold).sum())
                          if len(sigs) > 1 else 0)
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "n_frames": pa.array(np.array(n_frames, dtype=np.int64)),
            "n_cuts": pa.array(np.array(n_cuts, dtype=np.int64)),
        })
