"""Zero-shot ESC-50 via the pip-style module API — the TPU equivalent of
`CLAP/experiment_scripts/esc50_api.py` (reference file, lines 1-48).

Loads extracted ESC-50 test shards (flac + json pairs), embeds audio and the
"This is a sound of {label}." prompts, and prints retrieval-style metrics
(mean/median rank, R@k, mAP@10) — same protocol as `CLAP/README.md:261`.
"""

import glob
import json
import sys

import numpy as np

from audio_residual_tpu.module import CLAPModule

esc50_test_dir = sys.argv[1] if len(sys.argv) > 1 else "./ESC50_1/test/*/"
class_index_dict_path = (
    sys.argv[2] if len(sys.argv) > 2
    else "class_labels/ESC50_class_labels_indices_space.json"
)
ckpt = sys.argv[3] if len(sys.argv) > 3 else None

model = CLAPModule(enable_fusion=False)
model.load_ckpt(ckpt)  # None -> download the default published checkpoint

class_index_dict = json.load(open(class_index_dict_path))

audio_files = sorted(glob.glob(esc50_test_dir + "**/*.flac", recursive=True))
json_files = sorted(glob.glob(esc50_test_dir + "**/*.json", recursive=True))
ground_truth_idx = np.array(
    [class_index_dict[json.load(open(jf))["tag"][0]] for jf in json_files]
)[:, None]

all_texts = ["This is a sound of " + t for t in class_index_dict.keys()]
text_embed = model.get_text_embedding(all_texts)
audio_embed = model.get_audio_embedding_from_filelist(x=audio_files)

ranking = np.argsort(audio_embed @ text_embed.T, axis=-1)[:, ::-1]
preds = np.nonzero(ranking == ground_truth_idx)[1]

metrics = {"mean_rank": preds.mean() + 1, "median_rank": np.floor(np.median(preds)) + 1}
for k in (1, 5, 10):
    metrics[f"R@{k}"] = np.mean(preds < k)
metrics["mAP@10"] = np.mean(np.where(preds < 10, 1 / (preds + 1), 0.0))

print(
    "Zeroshot Classification Results: "
    + "\t".join(f"{k}: {round(v, 4):.4f}" for k, v in metrics.items())
)
