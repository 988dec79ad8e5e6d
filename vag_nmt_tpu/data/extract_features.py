"""Offline image-feature extraction (SURVEY.md C2, §3.4).

The reference runs torchvision ResNet-50 over Multi30k/IKEA images offline and
saves the pool5 (global-average-pool, 2048-d) matrix aligned with corpus line
order. Same contract here: one feature row per corpus line, saved as .npy with
an alignment-checksum sidecar (load_features verifies it — the silent
row-misalignment hazard called out in SURVEY.md §3.4).

Torch is used ONLY in this offline step (it is not part of the TPU runtime);
the training/decode pipeline consumes the .npy as an opaque float matrix.

Usage (via CLI):
    python -m vag_nmt_tpu extract-features \
        --image-dir imgs/ --image-list train_images.txt \
        --corpus train.en --out train_features.npy
where image-list has one image filename per corpus line.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def extract_resnet50_pool5(
    image_paths: List[str],
    batch_size: int = 32,
    device: str = "cpu",
) -> np.ndarray:
    """(N, 2048) pool5 features in image_paths order."""
    import torch
    import torchvision
    from torchvision import transforms
    from PIL import Image

    model = torchvision.models.resnet50(weights="IMAGENET1K_V1")
    model.fc = torch.nn.Identity()          # keep the avgpool output
    model.eval().to(device)
    prep = transforms.Compose([
        transforms.Resize(256),
        transforms.CenterCrop(224),
        transforms.ToTensor(),
        transforms.Normalize(mean=[0.485, 0.456, 0.406],
                             std=[0.229, 0.224, 0.225]),
    ])

    feats = np.zeros((len(image_paths), 2048), np.float32)
    with torch.no_grad():
        for i in range(0, len(image_paths), batch_size):
            chunk = image_paths[i: i + batch_size]
            imgs = torch.stack(
                [prep(Image.open(p).convert("RGB")) for p in chunk]).to(device)
            out = model(imgs)
            feats[i: i + len(chunk)] = out.cpu().numpy()
    return feats


def extract_to_file(
    image_dir: str,
    image_list: str,
    out_path: str,
    corpus_path: Optional[str] = None,
    batch_size: int = 32,
) -> None:
    from vag_nmt_tpu.data.features import save_features

    with open(image_list, encoding="utf-8") as f:
        names = [ln.strip() for ln in f if ln.strip()]
    paths = [os.path.join(image_dir, n) for n in names]
    corpus_lines = None
    if corpus_path:
        with open(corpus_path, encoding="utf-8") as f:
            corpus_lines = [ln.rstrip("\n") for ln in f]
        if len(corpus_lines) != len(paths):
            raise ValueError(
                f"image list has {len(paths)} entries, corpus "
                f"{len(corpus_lines)} lines — alignment would be corrupt")
    feats = extract_resnet50_pool5(paths, batch_size=batch_size)
    save_features(out_path, feats, corpus_lines=corpus_lines)
