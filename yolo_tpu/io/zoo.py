"""Pretrained-weights zoo: manifest + integrity verification
(SURVEY.md §2.1 — the reference's README points users at the official
pjreddie .weights downloads; this module makes those files first-class:
named resolution, exact-size validation, and SHA-256 pinning).

Two integrity layers:

* **Exact byte size** — computed from the variant's layer topology
  (header + 4 bytes x param count, `expected_weights_bytes`). This is
  derivable offline and catches truncated/mismatched downloads before
  the loader's full-consumption assert does, with a friendlier message.
* **SHA-256** — the manifest ships with ``sha256: null`` (this build
  environment has no network, so hashes could not be fetched —
  inventing them would be worse than absence). `record_sha` pins the
  hash on first use (trust-on-first-use); subsequent loads verify.

CLI surface: ``--weights zoo://<name>`` resolves through
``$YOLO_TPU_WEIGHTS_DIR`` (default ``~/.cache/yolo_tpu``), and the
``zoo`` subcommand lists/verifies entries.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Optional, Sequence

from yolo_tpu.configs.specs import Connected, LayerSpec, weighted_specs

_MANIFEST_PATH = os.path.join(os.path.dirname(__file__),
                              "zoo_manifest.json")
_HEADER_BYTES = 20  # yolov2-era files: major.minor >= 0.2 -> int64 seen


def expected_weights_bytes(layers: Sequence[LayerSpec],
                           input_channels: int = 3) -> int:
    """Exact .weights file size for a layer topology (darknet parse.c
    layout: per conv, (4 BN terms | 1 bias) x oc + oc*ic*k*k floats;
    per connected, out + out*in floats)."""
    from yolo_tpu.io.darknet_weights import _infer_in_channels

    from yolo_tpu.configs.specs import Local, Shortcut

    n = 0
    for spec, ic in zip(weighted_specs(layers), _infer_in_channels(
            layers, input_channels)):
        if isinstance(spec, Shortcut):
            # weighted shortcut blend weights (specs.Shortcut)
            n += 2 * (1 if spec.weights_type == "per_feature" else ic)
        elif isinstance(spec, Connected):
            n += spec.out + spec.out * ic
        elif isinstance(spec, Local):
            loc = spec.out_h * spec.out_w
            n += spec.filters * loc
            n += loc * spec.filters * spec.in_c * spec.size * spec.size
        else:
            n += spec.filters * (4 if spec.bn else 1)
            n += (spec.filters * (ic // spec.groups)
                  * spec.size * spec.size)
    return _HEADER_BYTES + 4 * n


def infer_variant(weights_path: str) -> Optional[str]:
    """Guess the model variant from a .weights file's byte size (exact
    for the pinned topologies; 16- and 20-byte headers both accepted).
    Returns None when no topology matches — e.g. custom class counts.
    Topology-identical variants at different net sizes (darknet19 vs
    darknet19-448) are indistinguishable by size; the first VARIANTS
    entry wins."""
    from yolo_tpu.configs.variants import VARIANTS

    actual = os.path.getsize(weights_path)
    for name, cfg in VARIANTS.items():
        want = expected_weights_bytes(cfg.layers, cfg.in_channels)
        if actual in (want, want - 4):
            return name
    return None


def load_manifest(path: Optional[str] = None) -> Dict[str, Dict]:
    with open(path or _MANIFEST_PATH) as f:
        return json.load(f)


def save_manifest(manifest: Dict[str, Dict],
                  path: Optional[str] = None) -> None:
    with open(path or _MANIFEST_PATH, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
        f.write("\n")


def sha256_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                return h.hexdigest()
            h.update(b)


def weights_dir() -> str:
    return os.environ.get(
        "YOLO_TPU_WEIGHTS_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "yolo_tpu"))


def resolve(spec: str, manifest: Optional[Dict[str, Dict]] = None,
            manifest_path: Optional[str] = None) -> str:
    """``zoo://<name>`` -> verified local file path. Raises with the
    download URL if the file is absent, and on any integrity failure."""
    name = spec[len("zoo://"):] if spec.startswith("zoo://") else spec
    manifest = manifest or load_manifest(manifest_path)
    if name not in manifest:
        raise KeyError(f"unknown zoo entry '{name}' "
                       f"(have: {', '.join(sorted(manifest))})")
    entry = manifest[name]
    path = os.path.join(weights_dir(), entry["filename"])
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"weights file not found: {path}\n"
            f"download it first:  curl -o '{path}' '{entry['url']}'\n"
            f"(or set YOLO_TPU_WEIGHTS_DIR)")
    problems = verify_file(path, entry)
    if problems:
        raise ValueError(f"integrity check failed for {path}: "
                         + "; ".join(problems))
    return path


def verify_file(path: str, entry: Dict) -> list:
    """Returns a list of problem strings (empty = OK). Size mismatch is
    always fatal; SHA is only checked when the manifest pins one.

    The manifest pins the 20-byte-header size (the yolov2-era files);
    a 16-byte-header file (darknet version < 0.2, 4 bytes smaller) has
    identical tensor data and loads fine, so it is accepted too."""
    problems = []
    actual = os.path.getsize(path)
    if actual not in (entry["size_bytes"], entry["size_bytes"] - 4):
        problems.append(f"size {actual} != expected {entry['size_bytes']} "
                        f"(truncated or wrong file)")
        return problems  # don't bother hashing a wrong-sized file
    if entry.get("sha256"):
        got = sha256_file(path)
        if got != entry["sha256"]:
            problems.append(f"sha256 {got} != pinned {entry['sha256']}")
    return problems


def record_sha(name: str, path: str,
               manifest_path: Optional[str] = None) -> str:
    """Trust-on-first-use: pin the file's SHA-256 into the manifest
    (refuses if the size check fails or a different hash is pinned)."""
    manifest = load_manifest(manifest_path)
    entry = manifest[name]
    # size check WITHOUT the pinned-sha pass (verify_file would hash
    # the file once just to have the result discarded before the
    # second hash below — 2x the I/O on 250 MB files; code-review
    # finding)
    problems = verify_file(path, {k: v for k, v in entry.items()
                                  if k != "sha256"})
    if problems:
        raise ValueError("; ".join(problems))
    got = sha256_file(path)
    if entry.get("sha256") and entry["sha256"] != got:
        raise ValueError(f"refusing to overwrite pinned sha256 for {name} "
                         f"({entry['sha256']} -> {got})")
    entry["sha256"] = got
    save_manifest(manifest, manifest_path)
    return got
