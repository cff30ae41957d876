"""Training data pipeline: manifest parsing, shard roundtrip, batching.

(The featurization path needs loaded models — covered in test_e2e.py's
test_featurize_and_train_step with the tiny-asset facade.)
"""
import json

import numpy as np
import pytest

from gsv_tts_tpu import train_data
from gsv_tts_tpu.models.t2s import T2SConfig


def test_read_manifest_list_and_jsonl(tmp_path):
    wav = tmp_path / "a.wav"
    wav.write_bytes(b"")
    lst = tmp_path / "train.list"
    lst.write_text("a.wav|spk0|ZH|你好，世界|带竖线\n"
                   "/abs/b.wav|spk1|en|hello world\n", encoding="utf-8")
    items = train_data.read_manifest(lst)
    assert items[0] == (str(tmp_path / "a.wav"), "你好，世界|带竖线", "zh")
    assert items[1] == ("/abs/b.wav", "hello world", "en")

    jl = tmp_path / "train.jsonl"
    jl.write_text(json.dumps({"wav": "a.wav", "text": "hi"}) + "\n" +
                  json.dumps({"wav": "/abs/c.wav", "text": "yo", "lang": "ja"}) + "\n")
    items = train_data.read_manifest(jl)
    assert items[0] == (str(tmp_path / "a.wav"), "hi", "auto")
    assert items[1] == ("/abs/c.wav", "yo", "ja")

    bad = tmp_path / "bad.list"
    bad.write_text("only|three|fields\n")
    with pytest.raises(ValueError):
        train_data.read_manifest(bad)


def test_samples_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    samples = [
        (rng.randint(1, 50, 7).astype(np.int32),
         rng.randint(0, 100, 11).astype(np.int32),
         rng.randn(7, 1024).astype(np.float32)),
        (rng.randint(1, 50, 3).astype(np.int32),
         rng.randint(0, 100, 5).astype(np.int32),
         None),
        (rng.randint(1, 50, 9).astype(np.int32),
         rng.randint(0, 100, 2).astype(np.int32),
         rng.randn(9, 1024).astype(np.float32)),
    ]
    p = tmp_path / "shard.npz"
    train_data.save_samples(p, samples)
    back = train_data.load_samples(p)
    assert len(back) == 3
    for (x, y, b), (x2, y2, b2) in zip(samples, back):
        np.testing.assert_array_equal(x, x2)
        np.testing.assert_array_equal(y, y2)
        if b is None:
            assert b2 is None
        else:
            np.testing.assert_array_equal(b, b2)


def test_batches_cover_all_and_bound_shapes():
    cfg = T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4, num_layers=2,
                    vocab_size=101, phoneme_vocab_size=50, eos=100)
    rng = np.random.RandomState(1)
    samples = [
        (rng.randint(1, 50, rng.randint(3, 40)).astype(np.int32),
         rng.randint(0, 100, rng.randint(3, 60)).astype(np.int32),
         None)
        for _ in range(13)
    ]
    seen = 0
    shapes = set()
    for batch in train_data.batches(cfg, samples, batch_size=4, seed=7):
        B, Lx = batch["x_ids"].shape
        assert B == 4 and Lx % 32 == 0
        assert batch["y_ids"].shape[1] % 32 == 0
        assert batch["bert"].shape == (B, Lx, cfg.bert_dim)
        assert (np.asarray(batch["x_lens"]) > 0).all()
        shapes.add((Lx, batch["y_ids"].shape[1]))
        seen += B
    assert seen == 16  # 13 samples → 4 batches, last padded by repetition
    # length-sorted batching keeps the jit-shape count small
    assert len(shapes) <= 4

    # deterministic eval order with seed=None
    first = [np.asarray(b["x_lens"]).tolist()
             for b in train_data.batches(cfg, samples, 4, seed=None)]
    second = [np.asarray(b["x_lens"]).tolist()
              for b in train_data.batches(cfg, samples, 4, seed=None)]
    assert first == second

    # drop_remainder drops the ragged tail
    n = sum(1 for _ in train_data.batches(cfg, samples, 4, drop_remainder=True))
    assert n == 3
