"""SQL-ish translator semantics + multimodal stage plumbing."""

import numpy as np
import pyarrow as pa
import pytest


def test_multimodal_pipeline(ray_session):
    from osmquadtree_depreceated_ray.stages.multimodal import (
        DecodeFeatureActor,
        FrameSampleActor,
        ResizeActor,
        gen_media_table,
        media_pipeline,
    )

    from osmquadtree_depreceated_ray.functions.media_codecs import (
        block_resize, png_decode,
    )
    from osmquadtree_depreceated_ray.stages.multimodal import _image_array

    media = gen_media_table(50)
    out = media_pipeline(media).to_pandas().sort_values(
        "media_id").reset_index(drop=True)
    assert len(out) == 50
    assert len(out["feature"].iloc[0]) == 64
    # REAL image decode: row 0 is an image; its feature must equal the
    # 8x8 area-resample of the actual PNG pixels
    meta0 = media.column("meta")[0].as_py()
    expect = block_resize(
        _image_array(0 + 42, meta0["width"], meta0["height"]), 8, 8
    ).astype(np.float32).ravel()
    assert np.array_equal(np.asarray(out["feature"].iloc[0]), expect)
    # REAL audio decode: row 1 is audio; RMS envelope is positive
    assert out["kind"].iloc[1] == "audio"
    assert np.asarray(out["feature"].iloc[1]).mean() > 100
    # determinism
    out2 = media_pipeline(media).to_pandas().sort_values(
        "media_id").reset_index(drop=True)
    assert (out["mean_px"].to_numpy() == out2["mean_px"].to_numpy()).all()

    # REAL video decode: row 2 is video; its feature equals the mean of
    # the per-frame 8x8 resamples of the MP4's PNG samples
    from osmquadtree_depreceated_ray.functions.media_codecs import (
        mp4_extract_samples,
    )

    assert out["kind"].iloc[2] == "video"
    vid_payload = media.column("payload")[2].as_py()
    vframes = mp4_extract_samples(vid_payload)
    acc = np.zeros((8, 8))
    for fb in vframes:
        acc += block_resize(png_decode(fb), 8, 8)
    expect_v = (acc / len(vframes)).astype(np.float32).ravel()
    assert np.array_equal(np.asarray(out["feature"].iloc[2]), expect_v)

    # strict=True decodes ALL kinds now (video is real); it raises only
    # on an unparseable payload
    actor = DecodeFeatureActor(strict=True)
    actor(media)
    corrupt = media.set_column(
        media.schema.get_field_index("payload"), "payload",
        pa.array([b"not-a-container"] * media.num_rows, pa.binary()))
    corrupt_video = corrupt.filter(
        pa.compute.equal(corrupt.column("kind"), "video"))
    with pytest.raises(ValueError):
        actor(corrupt_video)
    # non-strict falls back to the deterministic digest fake (video
    # only — image/audio decode errors always surface)
    DecodeFeatureActor(strict=False)(corrupt_video)

    resized = ResizeActor(128, 128)(media)
    assert resized.column("meta")[0].as_py()["width"] == 128
    # the resized payload is a genuine PNG at the target size
    img = png_decode(resized.column("payload")[0].as_py())
    assert img.shape == (128, 128)

    frames = FrameSampleActor(every_ms=5000)(media)
    assert frames.num_rows >= media.num_rows  # videos expand to frames
    fdf = frames.to_pandas()
    vids = fdf[fdf["frame_png"].notna()]
    assert len(vids) > 0
    # sampled frame bytes are genuine PNG frames from inside the MP4
    some = vids.iloc[0]
    img = png_decode(some["frame_png"])
    assert img.ndim == 2 and img.size > 0

    # an unparseable video payload: non-strict emits zero frames for
    # that row (pipeline survives); strict raises
    out = FrameSampleActor(every_ms=5000)(corrupt_video)
    assert out.num_rows == 0
    with pytest.raises(ValueError):
        FrameSampleActor(every_ms=5000, strict=True)(corrupt_video)


def test_sqlish_expressions(ray_session):
    import ray

    from osmquadtree_depreceated_ray.pipelines.sqlish import (
        Query, case_when, col, lit,
    )

    t = pa.table(
        {
            "a": pa.array([1, 2, 3, 4, None], pa.int64()),
            "s": pa.array(["foo", "bar", "foobar", "baz", None]),
        }
    )
    ds = ray.data.from_arrow(t)
    out = (
        Query(ds)
        .where(col("s").like("foo%"))
        .select(a2=col("a") * 2,
                tag=case_when([(col("a") > 2, lit("big"))], default=lit("small")),
                pre=col("s").substr(1, 2))
        .order_by("a2")
        .run()
        .to_pandas()
    )
    assert out["a2"].tolist() == [2, 6]
    assert out["tag"].tolist() == ["small", "big"]
    assert out["pre"].tolist() == ["fo", "fo"]

    # union + limit + null handling
    q1 = Query(ds).select(v=col("a").coalesce(lit(0)))
    q2 = Query(ds).select(v=col("a").coalesce(lit(0)))
    n = q1.union(q2).run().count()
    assert n == 10


def test_query_tiles_partition_pruned(ray_session, fixture_dir, tmp_path_factory):
    """The reference execution model: SQL after spatial pruning — the
    sqlish surface over a tiled output directory."""
    import os

    from osmquadtree_depreceated_ray.pipelines import tile as tp
    from osmquadtree_depreceated_ray.pipelines.spatial_filter import BboxTest
    from osmquadtree_depreceated_ray.pipelines.sqlish import col, query_tiles

    out = str(tmp_path_factory.mktemp("qt_sql"))
    tp.tile_pages(os.path.join(fixture_dir, "pages.parquet"), out,
                  target=300, minimum=20)
    bt = BboxTest(-800_000_000, 300_000_000, -600_000_000, 500_000_000)
    q = (
        query_tiles(out, bt, columns=["entity_id", "lon", "lat", "qt"])
        .where(col("lon") < 0)
        .select(entity_id=col("entity_id"), lon2=col("lon") * 2)
        .order_by("entity_id")
    )
    got = q.run().to_pandas()
    assert len(got) > 0
    assert (got["lon2"] % 2 == 0).all()
    assert got["entity_id"].is_monotonic_increasing
