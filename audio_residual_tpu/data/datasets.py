"""Dataset registry, download, and K-fold splits.

Reference: `data_processing/download_utils.py` (DATASETS registry,
idempotent download+extract, standardized DataFrame) and
`data_processing/audio_dataset.py:58-106` (predefined-fold dataloaders,
pad-collate). Class-label lists and fold structure are dataset facts
(ESC-50: 2000 clips / 5 folds / 50 classes / 5 s @ 44.1k source;
UrbanSound8K: 8732 clips / 10 folds / 10 classes / 1-4 s variable).

TPU-first loader design: batches are plain numpy ``(wav [B, T], label [B])``
pairs (featurization happens on device in the jitted encode step), with
variable-length sets right-padded to the batch max + mono-downmixed, matching
``pad_collate_fn``. Audio decode is gated on an available backend
(soundfile/librosa are absent in this image; WAV files decode via the stdlib
fallback).
"""

from __future__ import annotations

import os
import tarfile
import urllib.request
import wave
import zipfile
from typing import Callable, Iterator

import numpy as np

__all__ = [
    "DATASETS",
    "download_dataset",
    "get_dataframe",
    "load_wav",
    "AudioDataset",
    "get_fold_batches",
    "pad_collate",
    "class_prompts",
]

ESC_50_CLASS_LABELS = [
    "dog", "rooster", "pig", "cow", "frog", "cat", "hen", "insects",
    "sheep", "crow", "rain", "sea_waves", "crackling_fire", "crickets",
    "chirping_birds", "water_drops", "wind", "pouring_water", "toilet_flush",
    "thunderstorm", "crying_baby", "sneezing", "clapping", "breathing",
    "coughing", "footsteps", "laughing", "brushing_teeth", "snoring",
    "drinking_sipping", "door_wood_knock", "mouse_click", "keyboard_typing",
    "door_wood_creaks", "can_opening", "washing_machine", "vacuum_cleaner",
    "clock_alarm", "clock_tick", "glass_breaking", "helicopter", "chainsaw",
    "siren", "car_horn", "engine", "train", "church_bells", "airplane",
    "fireworks", "hand_saw",
]

URBAN_SOUND_CLASS_LABELS = [
    "air_conditioner", "car_horn", "children_playing", "dog_bark", "drilling",
    "engine_idling", "gun_shot", "jackhammer", "siren", "street_music",
]

DATASETS = {
    "ESC50": {
        "url": "https://github.com/karoldvl/ESC-50/archive/master.zip",
        "out_dir": "data/esc50.zip",
        "audio_dir": "data/esc50/ESC-50-master/audio/",
        "csv_path": "data/esc50/ESC-50-master/meta/esc50.csv",
        "columns": {"file_column": "filename", "label_column": "target", "fold_column": "fold"},
        "class_labels": ESC_50_CLASS_LABELS,
        "n_folds": 5,
        "audio_len": 5,
    },
    "UrbanSound8K": {
        "url": "https://zenodo.org/record/1203745/files/UrbanSound8K.tar.gz",
        "out_dir": "data/urbansound.tar.gz",
        "audio_dir": "data/urbansound/UrbanSound8K/audio/",
        "csv_path": "data/urbansound/UrbanSound8K/metadata/UrbanSound8K.csv",
        "columns": {"file_column": "slice_file_name", "label_column": "classID", "fold_column": "fold"},
        "class_labels": URBAN_SOUND_CLASS_LABELS,
        "n_folds": 10,
        "audio_len": (1, 4),
    },
}


def class_prompts(dataset: str, template: str = "This is a sound of {}.") -> list[str]:
    """Zero-shot text prompts (`evaluate/eval_zeroshot_classification.py`
    protocol: 'This is a sound of {label}.', underscores -> spaces)."""
    return [template.format(c.replace("_", " ")) for c in DATASETS[dataset]["class_labels"]]


def download_dataset(url: str, dest_path: str) -> str:
    """Idempotent download + archive extraction
    (`download_utils.py:49-93`). Requires network egress."""
    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
    if not os.path.exists(dest_path):
        urllib.request.urlretrieve(url, dest_path)
    extract_path = os.path.splitext(dest_path)[0]
    if dest_path.endswith(".zip"):
        if not os.path.isdir(extract_path):
            with zipfile.ZipFile(dest_path) as z:
                z.extractall(extract_path)
    elif dest_path.endswith((".tar.gz", ".tgz")):
        extract_path = dest_path.rsplit(".tar.gz", 1)[0].rsplit(".tgz", 1)[0]
        if not os.path.isdir(extract_path):
            with tarfile.open(dest_path) as t:
                t.extractall(extract_path)
    else:
        extract_path = dest_path
    return extract_path


def get_dataframe(dataset: str, root: str = "."):
    """Standardized (filename, target, fold) DataFrame
    (`download_utils.py:96-130`); downloads on first use."""
    import pandas as pd

    spec = DATASETS[dataset]
    csv_path = os.path.join(root, spec["csv_path"])
    if not os.path.exists(csv_path):
        download_dataset(spec["url"], os.path.join(root, spec["out_dir"]))
    df = pd.read_csv(csv_path)
    cols = spec["columns"]
    out = pd.DataFrame(
        {
            "filename": df[cols["file_column"]],
            "target": df[cols["label_column"]],
            "fold": df[cols["fold_column"]],
        }
    )
    if dataset == "UrbanSound8K":
        # audio lives in fold subdirectories
        out["filename"] = "fold" + df["fold"].astype(str) + "/" + out["filename"]
    return out


def load_wav(path: str, target_sr: int | None = None) -> tuple[np.ndarray, int]:
    """Decode audio -> (mono float32 [T], sr). Uses soundfile/librosa when
    available; falls back to the stdlib ``wave`` reader for PCM WAV."""
    try:
        import soundfile as sf

        data, sr = sf.read(path, dtype="float32", always_2d=True)
        wav_data = data.mean(axis=1)
    except ImportError:
        try:
            import librosa

            wav_data, sr = librosa.load(path, sr=None, mono=True)
        except ImportError:
            with wave.open(path, "rb") as w:
                sr = w.getframerate()
                n = w.getnframes()
                width = w.getsampwidth()
                raw = w.readframes(n)
                ch = w.getnchannels()
                if width == 2:
                    # native C fast path (falls back to numpy internally)
                    from audio_residual_tpu import native

                    wav_data = native.pcm16_to_float32_mono(raw, ch)
                else:
                    dtype = {1: np.uint8, 4: np.int32}[width]
                    x = np.frombuffer(raw, dtype=dtype).reshape(-1, ch)
                    if width == 1:
                        wav_data = (x.astype(np.float32) - 128.0) / 128.0
                    else:
                        wav_data = x.astype(np.float32) / float(np.iinfo(dtype).max)
                    wav_data = wav_data.mean(axis=1)
    if target_sr is not None and target_sr != sr:
        wav_data = resample_poly(wav_data, sr, target_sr)
        sr = target_sr
    return wav_data.astype(np.float32), sr


def resample_poly(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Windowed-sinc resampler (host-side; replaces torchaudio.Resample)."""
    if sr_in == sr_out:
        return x
    g = np.gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    # upsample by zero-stuffing, lowpass, downsample
    n_taps = 64 * max(up, down)
    cutoff = 0.5 / max(up, down)
    t = np.arange(-n_taps // 2, n_taps // 2 + 1)
    h = 2 * cutoff * np.sinc(2 * cutoff * t) * np.hamming(len(t))
    h *= up
    y = np.zeros(len(x) * up, dtype=np.float64)
    y[::up] = x
    y = np.convolve(y, h, mode="same")
    return y[::down].astype(np.float32)


class AudioDataset:
    """Raw-waveform dataset over a (filename, target, fold) frame
    (`data_processing/audio_dataset.py:8-54`)."""

    def __init__(self, df, audio_dir: str, target_sr: int | None = None):
        self.df = df.reset_index(drop=True)
        self.audio_dir = audio_dir
        self.target_sr = target_sr

    def __len__(self):
        return len(self.df)

    def __getitem__(self, i: int) -> tuple[np.ndarray, int]:
        row = self.df.iloc[i]
        wav_data, _ = load_wav(os.path.join(self.audio_dir, row["filename"]), self.target_sr)
        return wav_data, int(row["target"])


def pad_collate(batch: list[tuple[np.ndarray, int]]) -> tuple[np.ndarray, np.ndarray]:
    """Right-pad to batch max (`audio_dataset.py:89-106`)."""
    max_len = max(len(w) for w, _ in batch)
    wav_data = np.zeros((len(batch), max_len), np.float32)
    labels = np.empty((len(batch),), np.int64)
    for i, (w, y) in enumerate(batch):
        wav_data[i, : len(w)] = w
        labels[i] = y
    return wav_data, labels


def get_fold_batches(
    dataset: AudioDataset,
    batch_size: int = 8,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = False,
) -> Callable[[], Iterator]:
    """Batch generator factory (re-iterable per epoch)."""

    def gen():
        rng = np.random.default_rng(seed)
        idx = np.arange(len(dataset))
        if shuffle:
            rng.shuffle(idx)
        end = len(idx) - (len(idx) % batch_size) if drop_last else len(idx)
        for i in range(0, end, batch_size):
            chunk = idx[i : i + batch_size]
            yield pad_collate([dataset[j] for j in chunk])

    return gen


def get_fold_loaders(
    dataset_name: str,
    root: str = ".",
    batch_size: int = 8,
    target_sr: int = 48000,
) -> list[tuple[Callable, Callable]]:
    """Per-fold (train_batches, val_batches) pairs using the dataset's
    predefined fold column (`audio_dataset.py:58-87`)."""
    spec = DATASETS[dataset_name]
    df = get_dataframe(dataset_name, root)
    audio_dir = os.path.join(root, spec["audio_dir"])
    folds = sorted(df["fold"].unique())
    out = []
    for f in folds:
        train_ds = AudioDataset(df[df["fold"] != f], audio_dir, target_sr)
        val_ds = AudioDataset(df[df["fold"] == f], audio_dir, target_sr)
        out.append(
            (
                get_fold_batches(train_ds, batch_size, shuffle=True, seed=int(f)),
                get_fold_batches(val_ds, batch_size, shuffle=False),
            )
        )
    return out
