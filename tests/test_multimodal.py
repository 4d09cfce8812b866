"""Multimodal actor-pool stages (fake codec; real codec is a marked stub)."""

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _registry():
    from fhir_data_validation_ray.pipelines.validate import fixture_paths

    return fixture_paths(SF_DIR)["registry"]


def test_synth_media_schema_and_determinism():
    from fhir_data_validation_ray.stages.multimodal import MEDIA_SCHEMA, synth_media

    a = synth_media(_registry())
    b = synth_media(_registry())
    assert a.schema == MEDIA_SCHEMA
    assert a.equals(b)
    kinds = set(a["kind"].to_pylist())
    assert kinds == {"image", "audio", "video"}


def test_image_meta_actor_pool(ray_session):
    from fhir_data_validation_ray.stages.multimodal import ImageMetaStage, media_pipeline

    out = media_pipeline(_registry(), kind="image", stage=(ImageMetaStage, {})).to_pandas()
    assert len(out) > 0
    assert set(out.columns) == {"media_ref", "width", "height", "channels", "payload_bytes"}
    assert (out.width >= 16).all() and (out.channels.between(1, 4)).all()


def test_resize_then_meta_roundtrip(ray_session):
    from fhir_data_validation_ray.stages.multimodal import (
        ImageMetaStage,
        ImageResizeStage,
        media_pipeline,
    )

    # chained actor pools must leave CPUs for the upstream task stage in the
    # 4-CPU test session (2 pools x 2 actors would deadlock the scheduler)
    resized = media_pipeline(
        _registry(), kind="image",
        stage=(ImageResizeStage, {"width": 32, "height": 24}), concurrency=1,
    )
    meta = resized.map_batches(
        ImageMetaStage, fn_constructor_kwargs={}, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    assert (meta.width == 32).all() and (meta.height == 24).all()


def test_audio_meta_and_frame_sampling(ray_session):
    from fhir_data_validation_ray.stages.multimodal import (
        AudioMetaStage,
        FrameSampleStage,
        media_pipeline,
        synth_media,
    )

    audio = media_pipeline(_registry(), kind="audio", stage=(AudioMetaStage, {})).to_pandas()
    assert (audio.n_samples == audio.duration_ms * audio.sample_rate // 1000).all()

    frames = media_pipeline(
        _registry(), kind="video", stage=(FrameSampleStage, {"every_k": 4})
    ).to_pandas()
    assert (frames.frame_index % 4 == 0).all()
    # expected count: sum over videos of ceil(n_frames / 4)
    import struct

    media = synth_media(_registry())
    vids = [p for k, p in zip(media["kind"].to_pylist(), media["payload"].to_pylist())
            if k == "video"]
    expect = sum(-(-struct.unpack_from("<HH", p, 4)[0] // 4) for p in vids)
    assert len(frames) == expect


def test_real_codec_is_marked_stub():
    from fhir_data_validation_ray.stages.multimodal import RealCodec

    rc = RealCodec()
    if rc._pil is None:  # container has no PIL
        with pytest.raises(NotImplementedError):
            rc.image_meta(b"anything")
    with pytest.raises(NotImplementedError):
        rc.audio_meta(b"anything")


def test_streaming_lane_matches_in_memory_lane(ray_session):
    """The parquet-streaming media entry point (the documented production
    pattern) must produce exactly the in-memory from_arrow lane's rows."""
    from fhir_data_validation_ray.stages.multimodal import ImageMetaStage, media_pipeline

    cols = ["media_ref", "width", "height", "channels", "payload_bytes"]
    a = media_pipeline(_registry(), kind="image",
                       stage=(ImageMetaStage, {}), streaming=True).to_pandas()
    b = media_pipeline(_registry(), kind="image",
                       stage=(ImageMetaStage, {}), streaming=False).to_pandas()
    key = lambda d: sorted(map(tuple, d[cols].values))
    assert key(a) == key(b)
    assert len(a) > 0


def test_ahash_bits_mean_rule():
    """bit i = 64*px[i] >= sum(px), LSB-first packing."""
    from fhir_data_validation_ray.stages.multimodal import ahash_bits

    t = np.zeros((1, 64), np.uint8)
    t[0, :2] = 255  # only two bright pixels: mean*64 = 510, so bits 0,1 set
    assert int(ahash_bits(t)[0]) == 0b11
    flat = np.full((1, 64), 7, np.uint8)  # uniform image -> all bits set
    assert int(ahash_bits(flat)[0]) == (1 << 64) - 1


def test_phash_finds_twin_pairs(ray_session):
    """Every ~d twin whose 2-pixel perturbation stays within Hamming 3 of
    its base must be paired; identical signatures always are."""
    from fhir_data_validation_ray.stages.multimodal import (
        FakeCodec,
        ahash_bits,
        phash_dups,
        synth_image_variants,
        synth_image_variants_parquet,
    )

    media = synth_image_variants(_registry())
    media = media.filter(
        np.asarray(media["kind"].to_numpy(zero_copy_only=False) == "image")
    )
    refs = media["media_ref"].to_pylist()
    codec = FakeCodec()
    sigs = ahash_bits(
        np.stack([codec.image_thumb64(p) for p in media["payload"].to_pylist()])
    )
    by_ref = dict(zip(refs, sigs))
    want = set()
    for r, s in by_ref.items():
        if not r.endswith("~d"):
            continue
        base = r[:-2]
        d = bin(int(s) ^ int(by_ref[base])).count("1")
        if d <= 3:
            want.add(tuple(sorted((base, r))))
    got = {
        tuple(p)
        for p in phash_dups(synth_image_variants_parquet(_registry()), concurrency=1)
        .to_pandas()[["ref_a", "ref_b"]]
        .values
    }
    assert want <= got  # twins within threshold all found (plus coincidences)
    assert len(want) > 0  # the fixture actually exercises the operator


# ---------------------------------------------------- cross-modal retrieval
def test_embed_text_matches_hash_embed(ray_session):
    """Driver-side embed_text is the single-string twin of the distributed
    textops.hash_embed fold (same FNV word formula)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.multimodal import CM_DIM, embed_text
    from fhir_data_validation_ray.stages.textops import hash_embed

    texts = ["image w0 h0 c1", "image w4 h3 c2", "", "solo"]
    ds = rd.from_arrow(pa.table({"doc_id": [f"d{i}" for i in range(len(texts))],
                                 "text": texts}))
    rows = sorted(hash_embed(ds, dim=CM_DIM).take_all(),
                  key=lambda r: r["doc_id"])
    for r, text in zip(rows, texts):
        want = embed_text(text, CM_DIM)
        got = np.array([r[f"e{j}"] for j in range(CM_DIM)])
        assert (got == want).all(), (text, got, want)


def test_crossmodal_topk_shape_and_determinism(ray_session, tmp_path):
    import numpy as np

    from fhir_data_validation_ray.pipelines.validate import fixture_paths
    from fhir_data_validation_ray.stages.multimodal import (
        CM_QUERIES,
        crossmodal_topk,
    )

    reg = fixture_paths("/root/testdata/sf0.001")["registry"]
    out = crossmodal_topk(reg, k=3).take_all()
    # 3 rows per query, ranks 1..3, scores non-increasing within a query
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(len(CM_QUERIES)))
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3]
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        # ties broken by media_ref ascending
        for a, b in zip(rows, rows[1:]):
            if a["score"] == b["score"]:
                assert a["media_ref"] < b["media_ref"]
    # deterministic across runs
    out2 = crossmodal_topk(reg, k=3).take_all()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(out, key=key) == sorted(out2, key=key)


def test_pack_interleaved_costs_and_dup_aggregation(ray_session):
    """Media spans cost their fixed per-kind budget, text spans their word
    count; duplicate doc_ids aggregate into ONE packed row; zero-span docs
    are not packed; offsets are doc_id-byte-order exclusive prefix sums."""
    import pyarrow as pa
    import ray.data as rd

    from fhir_data_validation_ray.stages.packing import pack_interleaved

    def row(doc_id, spans):
        return {"doc_id": doc_id,
                "spans": [{"kind": k, "text": t, "media_ref": "",
                           "offset": i} for i, (k, t) in enumerate(spans)]}

    tbl = pa.Table.from_pylist([
        row("doc.a", [("text", "one two three"), ("image", "")]),   # 3 + 64
        row("doc.a", [("audio", None)]),                            # +128 dup
        row("doc.b", [("text", "  x ")]),                           # 1
        row("doc.c", []),                                           # excluded
    ])
    got = {r["doc_id"]: r for r in
           pack_interleaved(rd.from_arrow(tbl).repartition(4),
                            n_shards=1).take_all()}
    assert set(got) == {"doc.a", "doc.b"}
    assert got["doc.a"]["n_tokens"] == 3 + 64 + 128
    assert got["doc.b"]["n_tokens"] == 1
    # byte order: doc.a before doc.b -> offsets 0 then 195
    assert got["doc.a"]["tok_offset"] == 0
    assert got["doc.b"]["tok_offset"] == 195
    assert got["doc.b"]["seq_in_shard"] == 0
