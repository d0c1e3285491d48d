"""Native clip-cache tests: C++ build, round-trip, threaded batch reads,
pipeline integration."""

import os

import numpy as np
import pandas as pd
import pytest

from crowded_scenes_ensemble_classification_tpu.data.clip_cache import (
    CachingClipSource,
    ClipCacheReader,
    ClipCacheWriter,
    cache_path_for,
)


@pytest.fixture(scope="module")
def cache_file(tmp_path_factory, ):
    rng = np.random.default_rng(0)
    path = str(tmp_path_factory.mktemp("cc") / "clips.ccache")
    w = ClipCacheWriter(path)
    clips = []
    for i in range(10):
        clip = rng.integers(0, 256, (6, 16, 16, 3)).astype(np.uint8)
        clips.append(clip)
        w.add(f"clip{i}", clip, label=i % 3)
    w.finish()
    return path, clips


def test_roundtrip(cache_file):
    path, clips = cache_file
    r = ClipCacheReader(path)
    assert len(r) == 10
    for i in (0, 5, 9):
        clip, label = r.read(i)
        np.testing.assert_array_equal(clip, clips[i])
        assert label == i % 3
    shape, label = r.shape(3)
    assert shape == (6, 16, 16, 3) and label == 0
    assert r.keys["clip7"] == 7
    r.close()


def test_threaded_batch_read(cache_file):
    path, clips = cache_file
    r = ClipCacheReader(path)
    idx = [9, 0, 4, 4, 2]
    batch, labels = r.read_batch(idx, num_threads=4)
    assert batch.shape == (5, 6, 16, 16, 3)
    for j, i in enumerate(idx):
        np.testing.assert_array_equal(batch[j], clips[i])
        assert labels[j] == i % 3
    r.close()


def test_caching_source_populate_and_read(tmp_path):
    rng = np.random.default_rng(1)
    clips = [rng.integers(0, 256, (4, 8, 8, 3)).astype(np.uint8) for _ in range(5)]
    df = pd.DataFrame({"rgbclips_path": [f"p{i}" for i in range(5)], "class": range(5)})
    calls = {"n": 0}

    def source(row):
        calls["n"] += 1
        i = int(row.name)
        return {"rgb": clips[i], "label": np.int32(row["class"])}

    path = cache_path_for("test", str(tmp_path))
    cs = CachingClipSource(source, df, path)
    assert not cs.ready
    # pre-populate pass decodes each clip once
    cs.populate()
    assert cs.ready and calls["n"] == 5
    # reads now come from the native cache, not the source
    out = cs(df.iloc[2])
    assert calls["n"] == 5
    np.testing.assert_array_equal(out["rgb"], clips[2])
    assert int(out["label"]) == 2
    # reopening sees the cache immediately
    cs2 = CachingClipSource(source, df, path)
    assert cs2.ready


def test_pipeline_with_cache(tmp_path):
    from crowded_scenes_ensemble_classification_tpu.data import (
        BatchPipeline,
        SampleSpec,
        generate_synthetic_dataset,
    )

    df = generate_synthetic_dataset(
        str(tmp_path / "d"), num_scenes=4, clips_per_scene=2, num_classes=2,
        num_frames=6, hw=(24, 24), as_videos=False,
    ).rename(columns={"label": "class"})
    spec = SampleSpec(num_frames=6, staging_hw=(24, 24))
    cache = str(tmp_path / "clips.ccache")

    plain = BatchPipeline(df, spec, batch_size=4, shuffle=False, num_workers=2)
    cached = BatchPipeline(
        df, spec, batch_size=4, shuffle=False, num_workers=2, cache_file=cache
    )
    b_plain = list(plain.batches(0))
    b_cached = list(cached.batches(0))  # first call populates then reads
    assert cached.source.ready
    for a, b in zip(b_plain, b_cached):
        np.testing.assert_array_equal(a["rgb"], b["rgb"])
        np.testing.assert_array_equal(a["label"], b["label"])
        np.testing.assert_array_equal(a["valid"], b["valid"])

    # second pipeline over the same cache reads instantly
    again = BatchPipeline(
        df, spec, batch_size=4, shuffle=False, num_workers=2, cache_file=cache
    )
    assert again.source.ready
    for a, b in zip(b_plain, again.batches(0)):
        np.testing.assert_array_equal(a["rgb"], b["rgb"])


def test_interrupted_populate_never_corrupts(tmp_path):
    """A crash mid-populate leaves no file at the final path; the next
    run rebuilds from scratch (writer goes through a .tmp sidecar)."""
    rng = np.random.default_rng(1)
    path = str(tmp_path / "clips.ccache")
    w = ClipCacheWriter(path)
    w.add("clip0", rng.integers(0, 256, (4, 8, 8, 3)).astype(np.uint8), 0)
    del w  # simulated crash: finish() never runs
    assert not os.path.exists(path)
    assert os.path.exists(path + ".tmp")

    df = pd.DataFrame({"path": ["a", "b"], "class": [0, 1]})
    clips = [rng.integers(0, 256, (4, 8, 8, 3)).astype(np.uint8) for _ in df.index]

    def source(row):
        i = {"a": 0, "b": 1}[row["path"]]
        return {"rgb": clips[i], "label": int(row["class"])}

    src = CachingClipSource(source, df, path)
    assert not src.ready
    src.populate()
    assert src.ready and os.path.exists(path)
    out = src(df.iloc[1])
    np.testing.assert_array_equal(out["rgb"], clips[1])


def test_stale_shard_dropped(tmp_path):
    """A shard whose clip count mismatches the dataframe is discarded."""
    rng = np.random.default_rng(2)
    path = str(tmp_path / "clips.ccache")
    w = ClipCacheWriter(path)
    w.add("old", rng.integers(0, 256, (4, 8, 8, 3)).astype(np.uint8), 0)
    w.finish()

    df = pd.DataFrame({"path": ["a", "b", "c"], "class": [0, 1, 2]})
    clip = rng.integers(0, 256, (4, 8, 8, 3)).astype(np.uint8)
    src = CachingClipSource(lambda row: {"rgb": clip, "label": 0}, df, path)
    assert not src.ready  # 1-clip shard != 3-row df → dropped
    src.populate()
    assert src.ready and len(src.reader) == 3
