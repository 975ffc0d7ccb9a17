"""Darknet ``.cfg`` file parser -> ModelConfig (SURVEY.md §2.1 'Config':
the reference class hardcodes its variants; this goes further so ANY
yolov2-family cfg + .weights pair a darknet user has — custom class
counts, pruned filters, different anchors — runs unmodified:

    python -m yolo_tpu.cli predict --cfg my.cfg --names my.names \
        --weights my.weights --image dog.jpg

Supported sections (the yolov2 family): [net] (width/height/channels),
[convolutional] (batch_normalize, filters, size, stride, activation
leaky|linear), [maxpool] (size, stride), [route] (layers), [reorg]
(stride), [region] (anchors, classes). Anything else — yolov3
[shortcut]/[upsample]/[yolo], training-only keys — raises a clear error
rather than silently mis-building the graph.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from yolo_tpu.configs.specs import (Conv, MaxPool, ModelConfig, Reorg,
                                    Route)

_SUPPORTED = {"net", "convolutional", "maxpool", "route", "reorg",
              "region"}


def parse_cfg(path: str) -> List[Tuple[str, Dict[str, str]]]:
    """INI-like darknet cfg -> [(section_name, {key: value}), ...] in
    file order. '#' and ';' start comments; repeated sections are kept
    as separate entries (unlike configparser)."""
    sections: List[Tuple[str, Dict[str, str]]] = []
    with open(path) as f:
        for raw in f:
            line = raw.split("#")[0].split(";")[0].strip()
            if not line:
                continue
            if line.startswith("["):
                sections.append((line.strip("[] ").lower(), {}))
            else:
                if "=" not in line or not sections:
                    raise ValueError(f"malformed cfg line: {raw.rstrip()}")
                k, v = line.split("=", 1)
                sections[-1][1][k.strip()] = v.strip()
    return sections


def load_names(path: str) -> Tuple[str, ...]:
    """darknet .names file: one class name per line."""
    with open(path) as f:
        return tuple(line.strip() for line in f if line.strip())


def config_from_cfg(cfg_path: str, names_path: Optional[str] = None,
                    name: Optional[str] = None) -> ModelConfig:
    """Build a ModelConfig from a darknet cfg (+ optional .names)."""
    sections = parse_cfg(cfg_path)
    layers: List = []
    input_size = 416
    anchors: Tuple[Tuple[float, float], ...] = ()
    num_classes: Optional[int] = None

    for kind, kv in sections:
        if kind not in _SUPPORTED:
            raise ValueError(
                f"[{kind}] is not a yolov2-family section "
                f"(supported: {sorted(_SUPPORTED)})")
        if kind == "net":
            w = int(kv.get("width", 416))
            h = int(kv.get("height", w))
            if w != h:
                raise ValueError(f"non-square net {w}x{h} not supported")
            if int(kv.get("channels", 3)) != 3:
                raise ValueError("only channels=3 input is supported")
            input_size = w
        elif kind == "convolutional":
            act = kv.get("activation", "logistic")
            if act not in ("leaky", "linear"):
                raise ValueError(f"unsupported activation '{act}'")
            if int(kv.get("stride", 1)) != 1:
                raise ValueError("strided conv not in the yolov2 family")
            size = int(kv.get("size", 1))
            # darknet: padding = size//2 if pad else explicit `padding`
            # (default 0); the executor supports SAME (size//2) only —
            # reject rather than silently mis-build (a 3x3 conv without
            # pad=1 shifts every activation vs the matching weights)
            padding = (size // 2 if int(kv.get("pad", 0))
                       else int(kv.get("padding", 0)))
            if padding != size // 2:
                raise ValueError(
                    f"conv size={size} with padding={padding} is "
                    f"unsupported (only darknet pad=size//2; add pad=1)")
            layers.append(Conv(
                filters=int(kv["filters"]),
                size=size,
                bn=bool(int(kv.get("batch_normalize", 0))),
                act=act))
        elif kind == "maxpool":
            size = int(kv.get("size", 2))
            layers.append(MaxPool(size=size,
                                  stride=int(kv.get("stride", size))))
        elif kind == "route":
            rels = tuple(int(v) for v in kv["layers"].split(","))
            layers.append(Route(rels))
        elif kind == "reorg":
            layers.append(Reorg(int(kv.get("stride", 2))))
        elif kind == "region":
            vals = [float(v) for v in kv["anchors"].split(",")]
            n = int(kv.get("num", len(vals) // 2))
            anchors = tuple((vals[2 * i], vals[2 * i + 1])
                            for i in range(n))
            num_classes = int(kv.get("classes", 20))
            # NOTE: [region] thresh is darknet's TRAINING match
            # threshold, not the detection confidence — deliberately
            # not mapped onto conf_threshold (use --conf at the CLI)

    if not layers:
        raise ValueError(f"{cfg_path}: no layers found")
    if num_classes is None:
        raise ValueError(f"{cfg_path}: no [region] section")

    class_names = (load_names(names_path) if names_path
                   else tuple(f"class{i}" for i in range(num_classes)))
    if len(class_names) != num_classes:
        raise ValueError(
            f"[region] classes={num_classes} but names file has "
            f"{len(class_names)} entries")

    expected_out = len(anchors) * (5 + num_classes)
    last = layers[-1]
    if not isinstance(last, Conv) or last.filters != expected_out:
        raise ValueError(
            f"final conv must output num*(5+classes)={expected_out} "
            f"channels, got {getattr(last, 'filters', last)}")

    downsample = 1
    for l in layers:
        if isinstance(l, MaxPool):
            downsample *= l.stride
    if downsample != 32:
        # inference derives the grid from the feature shape, but the
        # GT encoder pins grid = input/32 (data/targets.py) — reject
        # rather than silently mis-train
        raise ValueError(
            f"trunk downsample must be 32 for the yolov2 region head, "
            f"got {downsample} (pool strides)")

    import os

    return ModelConfig(
        name=name or os.path.splitext(os.path.basename(cfg_path))[0],
        layers=tuple(layers), anchors=anchors, class_names=class_names,
        input_size=input_size)


def cfg_to_string(cfg: ModelConfig) -> str:
    """ModelConfig -> darknet .cfg text (inverse of config_from_cfg; the
    companion of io/darknet_weights.save for full darknet round-trip)."""
    out = [f"[net]\nwidth={cfg.input_size}\nheight={cfg.input_size}\n"
           f"channels=3\n"]
    for l in cfg.layers:
        if isinstance(l, Conv):
            out.append("[convolutional]\n"
                       + ("batch_normalize=1\n" if l.bn else "")
                       + f"filters={l.filters}\nsize={l.size}\nstride=1\n"
                       + f"pad={1 if l.size > 1 else 0}\n"
                       + f"activation={l.act}\n")
        elif isinstance(l, MaxPool):
            out.append(f"[maxpool]\nsize={l.size}\nstride={l.stride}\n")
        elif isinstance(l, Route):
            out.append("[route]\nlayers="
                       + ",".join(str(r) for r in l.layers) + "\n")
        elif isinstance(l, Reorg):
            out.append(f"[reorg]\nstride={l.stride}\n")
    anchors = ", ".join(f"{w:g},{h:g}" for w, h in cfg.anchors)
    out.append(f"[region]\nanchors = {anchors}\n"
               f"classes={cfg.num_classes}\nnum={cfg.num_anchors}\n")
    return "\n".join(out)
