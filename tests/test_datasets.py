"""Dataset layer tests on a synthetic mini-dataset (no network)."""

import json
import os
import wave

import numpy as np
import pytest

from audio_residual_tpu.data import datasets as D


def _write_wav(path, n=4000, sr=8000, seed=0):
    rng = np.random.default_rng(seed)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((rng.standard_normal(n) * 3000).astype(np.int16).tobytes())


@pytest.fixture
def mini_dataset(tmp_path):
    """Fake registry entry with real wav files + meta CSV, 2 folds x 4 clips."""
    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    rows = []
    for i in range(8):
        name = f"clip_{i}.wav"
        _write_wav(audio_dir / name, n=3000 + 500 * (i % 3), seed=i)
        rows.append((name, i % 3, 1 + i % 2))
    csv = tmp_path / "meta.csv"
    csv.write_text(
        "filename,target,fold\n" + "\n".join(f"{f},{t},{fo}" for f, t, fo in rows)
    )
    D.DATASETS["MINI"] = {
        "url": "file://none", "out_dir": "none",
        "audio_dir": str(audio_dir), "csv_path": str(csv),
        "columns": {"file_column": "filename", "label_column": "target", "fold_column": "fold"},
        "class_labels": ["a", "b", "c"], "n_folds": 2, "audio_len": 1,
    }
    yield "MINI"
    D.DATASETS.pop("MINI")


def test_get_dataframe_and_folds(mini_dataset):
    df = D.get_dataframe("MINI", root="/")
    assert len(df) == 8 and set(df["fold"]) == {1, 2}
    loaders = D.get_fold_loaders("MINI", root="/", batch_size=3)
    assert len(loaders) == 2
    train_batches, val_batches = loaders[0]
    b = next(iter(train_batches()))
    wav, labels = b
    assert wav.ndim == 2 and labels.ndim == 1
    # variable lengths right-padded to batch max
    assert wav.shape[1] >= 3000
    total = sum(len(l) for _, l in val_batches())
    assert total == 4  # fold 1 has 4 clips


def test_load_wav_stdlib_and_resample(tmp_path):
    p = tmp_path / "t.wav"
    _write_wav(p, n=8000, sr=8000)
    wav, sr = D.load_wav(str(p))
    assert sr == 8000 and wav.shape == (8000,) and wav.dtype == np.float32
    wav2, sr2 = D.load_wav(str(p), target_sr=4000)
    assert sr2 == 4000 and abs(len(wav2) - 4000) <= 2


def test_resample_preserves_tone():
    sr_in, sr_out = 8000, 4000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = D.resample_poly(x, sr_in, sr_out)
    t2 = np.arange(len(y)) / sr_out
    ref = np.sin(2 * np.pi * 440 * t2).astype(np.float32)
    # compare away from the edges (filter transient)
    corr = np.corrcoef(y[200:-200], ref[200 : len(y) - 200])[0, 1]
    assert corr > 0.99, corr


def test_class_prompts():
    prompts = D.class_prompts("ESC50")
    assert prompts[0] == "This is a sound of dog."
    assert prompts[11] == "This is a sound of sea waves."
    assert len(prompts) == 50


def test_read_params_txt(tmp_path):
    from audio_residual_tpu.evaluate.eval_retrieval_main import read_params_txt

    p = tmp_path / "params.txt"
    p.write_text("amodel: HTSAT-tiny\ntmodel: roberta\nlr: 0.0001\n")
    got = read_params_txt(str(p))
    assert got["amodel"] == "HTSAT-tiny" and got["lr"] == "0.0001"
