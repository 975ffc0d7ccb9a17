"""Darknet ``.weights`` binary I/O (SURVEY.md §3.4 — the reference's
checkpoint-compatibility contract, BASELINE.json:5).

File format (darknet ``parse.c`` save/load order):
  header: int32 major, minor, revision; then ``seen`` — int64 if
  major*10+minor >= 2 (20-byte header, the yolov2-era files), else int32
  (16 bytes).
  per conv layer, in cfg order:
    biases[oc]                       (this is BN beta when bn=True)
    if bn: scales[oc] (gamma), rolling_mean[oc], rolling_var[oc]
    kernel fp32, darknet (oc, ic, kh, kw) order -> transposed to HWIO here.
  per connected layer (classifier cfgs — save_connected_weights):
    biases[out], weights[out*in] row-major (out, in) -> (in, out) here.

Params pytree produced (and consumed by models/graph.py):
  [{"kernel": HWIO f32, "bias": (oc,)}            for bn=False convs,
   {"kernel": HWIO f32, "gamma","beta","mean","var": (oc,)} for bn=True,
   {"kernel": (in, out) f32, "bias": (out,)}       for connected]
ordered like ``weighted_specs(cfg.layers)``.

Both load and save are pure numpy — byte-identical on any backend.
"""

from __future__ import annotations

import io as _io
from typing import BinaryIO, List, Optional, Sequence

import numpy as np

from yolo_tpu.configs.specs import (Connected, Conv, LayerSpec, Local,
                                    Shortcut, weighted_specs)


def _infer_in_channels(layers: Sequence[LayerSpec], input_channels: int = 3) -> List[int]:
    """Input-feature count for each weight-carrying layer (Conv input
    channels; Connected input features — the cfg parser enforces 1x1
    spatial before [connected], so channels == flattened features),
    walking the layer graph."""
    from yolo_tpu.configs.specs import (MaxPool, Reorg, Route,
                                        ScaleChannels, resolve_route)

    out_ch: List[int] = []
    conv_in: List[int] = []
    prev = input_channels
    for idx, layer in enumerate(layers):
        if isinstance(layer, Conv):
            conv_in.append(prev)
            prev = layer.filters
        elif isinstance(layer, Connected):
            # spatial dense input: the parser pinned the flattened
            # feature count (yolov1 head); else features == channels
            conv_in.append(layer.in_features
                           if layer.in_features is not None else prev)
            prev = layer.out
        elif isinstance(layer, Local):
            conv_in.append(prev)
            prev = layer.filters
        elif isinstance(layer, MaxPool):
            pass
        elif isinstance(layer, Reorg):
            prev = prev * layer.stride * layer.stride
        elif isinstance(layer, Route):
            # yolov4 CSP: darknet slices EACH source into groups
            prev = sum(out_ch[resolve_route(idx, r)] // layer.groups
                       for r in layer.layers)
        elif isinstance(layer, ScaleChannels):
            # output adopts the FROM layer's shape (SE multiply)
            prev = out_ch[resolve_route(idx, layer.frm)]
        elif (isinstance(layer, Shortcut)
              and layer.weights_type != "none"):
            # weighted shortcut: the per_channel weight count is the
            # layer's OWN channel count (= the input's; shortcut
            # preserves it even on channel mismatch)
            conv_in.append(prev)
        # plain Shortcut/Sam/Upsample/AvgPool/Dropout/SoftmaxHead/
        # YoloHead preserve channel count and carry no weights — prev
        # flows through unchanged.
        out_ch.append(prev)
    return conv_in


def load(path_or_file, layers: Sequence[LayerSpec], input_channels: int = 3):
    """Load a darknet .weights file into a params list for ``layers``.

    Asserts the file is fully consumed and covers EVERY conv layer
    (SURVEY.md §3.4 'critical correctness check'); partial backbone
    files go through load_partial()."""
    params, header, n = load_partial(path_or_file, layers,
                                     input_channels=input_channels)
    total = len(weighted_specs(tuple(layers)))
    if n != total:
        raise ValueError(
            f"weights file too short: only {n} of {total} weighted "
            f"layers present (partial backbone file? use load_partial)")
    return params, header


def load_partial(path_or_file, layers: Sequence[LayerSpec],
                 input_channels: int = 3):
    """Load a possibly-TRUNCATED darknet .weights file (darknet's
    `partial` output — e.g. the official `darknet19_448.conv.23`
    backbone used to initialize YOLOv2 fine-tuning).

    Returns (params_prefix, header, n_convs_loaded). The file must end
    exactly at a conv-layer boundary (darknet cutoffs always do);
    anything else raises. A full file loads all layers (then this
    equals load())."""
    if hasattr(path_or_file, "read"):
        data = path_or_file.read()
    else:
        with open(path_or_file, "rb") as f:
            data = f.read()
    if len(data) < 16:
        raise ValueError(f"weights file too short ({len(data)} bytes "
                         f"— no header)")
    major, minor, revision = np.frombuffer(data, np.int32, 3)
    if major > 1000 or minor > 1000:
        # darknet parse.c: versions > 1000 flag the ANCIENT transposed
        # connected-weight format (transpose = (major>1000)||
        # (minor>1000)) and keep a 32-bit seen — reject loudly rather
        # than mis-walk the payload (code-review finding)
        raise ValueError(
            f"weights header major={major} minor={minor}: the "
            f"pre-2016 transposed format is not supported")
    # parse.c: 64-bit seen iff (major*10+minor) >= 2 (the >1000 guard
    # above mirrors its '&& major < 1000 && minor < 1000')
    if major * 10 + minor >= 2:
        seen = int(np.frombuffer(data, np.int64, 1, 12)[0])
        offset = 20
    else:
        seen = int(np.frombuffer(data, np.int32, 1, 12)[0])
        offset = 16
    if (len(data) - offset) % 4:
        raise ValueError("weights file truncated mid-float "
                         f"({len(data) - offset} payload bytes)")
    # zero-copy view of the payload (offset 16/20 is 4-byte aligned);
    # the old bytes round-trip peaked at ~3x file size on 258 MB files
    floats = np.frombuffer(data, np.float32, offset=offset)

    pos = 0
    params = []
    conv_in = _infer_in_channels(layers, input_channels)
    for spec, ic in zip(weighted_specs(tuple(layers)), conv_in):
        if isinstance(spec, Connected):
            # parser.c save_connected_weights: biases[out], then
            # weights[out*in] row-major (out, in) -> (in, out) here
            oc = spec.out
            need = oc + oc * ic
            if pos == floats.size:
                break  # clean cutoff boundary
            if pos + need > floats.size:
                raise ValueError(
                    f"weights file too short (ends mid-layer): "
                    f"connected {len(params)} needs {need} floats, "
                    f"{floats.size - pos} remain")
            p = {"bias": floats[pos:pos + oc].copy()}
            pos += oc
            w = floats[pos:pos + oc * ic].reshape(oc, ic)
            pos += oc * ic
            p["kernel"] = np.ascontiguousarray(w.T)
            params.append(p)
            continue
        if isinstance(spec, Local):
            # local_layer block (format-derived, see specs.Local):
            # biases[outputs] in CHW (filters, locations) order, then
            # location-major (filters, in_c, k, k) filter blocks
            hh, ww, oc, k = spec.out_h, spec.out_w, spec.filters, spec.size
            if not (hh and ww and spec.in_c):
                raise ValueError(
                    f"local layer {len(params)} has unpinned geometry "
                    f"(out_h/out_w/in_c) — build configs through the "
                    f"cfg parser, which sizes [local] from the input")
            loc = hh * ww
            need = oc * loc + loc * oc * spec.in_c * k * k
            if pos == floats.size:
                break  # clean cutoff boundary
            if pos + need > floats.size:
                raise ValueError(
                    f"weights file too short (ends mid-layer): local "
                    f"{len(params)} needs {need} floats, "
                    f"{floats.size - pos} remain")
            bias = floats[pos:pos + oc * loc].reshape(oc, hh, ww)
            pos += oc * loc
            w = floats[pos:pos + loc * oc * spec.in_c * k * k].reshape(
                hh, ww, oc, spec.in_c, k, k)
            pos += loc * oc * spec.in_c * k * k
            params.append({"bias": np.ascontiguousarray(
                               bias.transpose(1, 2, 0)),
                           "kernel": w.copy()})
            continue
        if isinstance(spec, Shortcut):
            # weighted shortcut (save_shortcut_weights): nweights
            # floats, group-major [w_in..., w_from...] — 2 for
            # per_feature, 2*C for per_channel (specs.Shortcut)
            per = 1 if spec.weights_type == "per_feature" else ic
            need = 2 * per
            if pos == floats.size:
                break  # clean cutoff boundary
            if pos + need > floats.size:
                raise ValueError(
                    f"weights file too short (ends mid-layer): "
                    f"weighted shortcut {len(params)} needs {need} "
                    f"floats, {floats.size - pos} remain")
            w = floats[pos:pos + need].reshape(2, per)
            pos += need
            params.append({"weights": w.copy()})
            continue
        conv = spec
        oc, k = conv.filters, conv.size
        if oc % conv.groups or ic % conv.groups:
            raise ValueError(
                f"conv {len(params)}: groups={conv.groups} must divide "
                f"filters={oc} and in_channels={ic}")
        ic = ic // conv.groups  # darknet grouped kernel: (oc, ic/g, k, k)
        need = oc * (4 if conv.bn else 1) + oc * ic * k * k
        if pos == floats.size:
            break  # clean cutoff boundary
        if pos + need > floats.size:
            raise ValueError(
                f"weights file too short (ends mid-layer): conv "
                f"{len(params)} needs {need} floats, "
                f"{floats.size - pos} remain")
        p = {}
        if conv.bn:
            p["beta"] = floats[pos:pos + oc].copy(); pos += oc
            p["gamma"] = floats[pos:pos + oc].copy(); pos += oc
            p["mean"] = floats[pos:pos + oc].copy(); pos += oc
            p["var"] = floats[pos:pos + oc].copy(); pos += oc
        else:
            p["bias"] = floats[pos:pos + oc].copy(); pos += oc
        kern = floats[pos:pos + oc * ic * k * k].reshape(oc, ic, k, k)
        pos += oc * ic * k * k
        p["kernel"] = np.ascontiguousarray(kern.transpose(2, 3, 1, 0))
        params.append(p)
    if pos != floats.size:
        raise ValueError(
            f"weights file not fully consumed: read {pos} of "
            f"{floats.size} floats — layer spec does not match file")
    header = {"major": int(major), "minor": int(minor),
              "revision": int(revision), "seen": seen}
    return params, header, len(params)


def save(path_or_file, layers: Sequence[LayerSpec], params, seen: int = 0,
         version=(0, 2, 0), cutoff_convs: Optional[int] = None) -> None:
    """Write params back out in darknet format (HWIO -> OIHW inverse
    transpose). Export proves checkpoint compatibility both directions
    (SURVEY.md §5.4). ``cutoff_convs`` writes only the first N conv
    layers (darknet's `partial` command — backbone extraction)."""
    own = not hasattr(path_or_file, "write")
    f: BinaryIO = open(path_or_file, "wb") if own else path_or_file
    try:
        major, minor, revision = version
        f.write(np.asarray([major, minor, revision], dtype=np.int32).tobytes())
        if major * 10 + minor >= 2:
            f.write(np.asarray([seen], dtype=np.int64).tobytes())
        else:
            f.write(np.asarray([seen], dtype=np.int32).tobytes())
        specs = weighted_specs(tuple(layers))
        if cutoff_convs is not None:
            specs, params = specs[:cutoff_convs], params[:cutoff_convs]
        elif len(params) != len(specs):
            # a short/long params list would silently write a
            # truncated file (or drop trailing params) that only
            # fails at the next load — reject loudly like
            # fold_params does (code-review finding)
            raise ValueError(
                f"save: {len(params)} param blocks for {len(specs)} "
                f"weighted layers (use cutoff_convs for partials)")
        for spec, p in zip(specs, params):
            if isinstance(spec, Connected):
                f.write(np.asarray(p["bias"], dtype=np.float32).tobytes())
                w = np.asarray(p["kernel"], dtype=np.float32)  # (in, out)
                f.write(np.ascontiguousarray(w.T).tobytes())
                continue
            if isinstance(spec, Local):
                bias = np.asarray(p["bias"], np.float32)  # (H', W', F)
                f.write(np.ascontiguousarray(
                    bias.transpose(2, 0, 1)).tobytes())
                f.write(np.asarray(p["kernel"],
                                   np.float32).tobytes())
                continue
            if isinstance(spec, Shortcut):
                # weighted shortcut: flat group-major blend weights
                f.write(np.ascontiguousarray(
                    np.asarray(p["weights"], np.float32)).tobytes())
                continue
            if spec.bn:
                for key in ("beta", "gamma", "mean", "var"):
                    f.write(np.asarray(p[key], dtype=np.float32).tobytes())
            else:
                f.write(np.asarray(p["bias"], dtype=np.float32).tobytes())
            kernel = np.asarray(p["kernel"], dtype=np.float32)
            f.write(np.ascontiguousarray(kernel.transpose(3, 2, 0, 1)).tobytes())
    finally:
        if own:
            f.close()


def random_params(layers: Sequence[LayerSpec], rng: np.random.Generator,
                  input_channels: int = 3, scale: float = 0.1):
    """Random params with the load() pytree structure — for synthetic
    weights files in tests and for seeded-weights parity testing
    (SURVEY.md §4.2.3)."""
    params = []
    conv_in = _infer_in_channels(layers, input_channels)
    for spec, ic in zip(weighted_specs(tuple(layers)), conv_in):
        if isinstance(spec, Connected):
            params.append({
                "kernel": rng.normal(0, scale,
                                     (ic, spec.out)).astype(np.float32),
                "bias": rng.normal(0, 0.1, spec.out).astype(np.float32)})
            continue
        if isinstance(spec, Local):
            params.append({
                "kernel": rng.normal(
                    0, scale, (spec.out_h, spec.out_w, spec.filters,
                               spec.in_c, spec.size, spec.size)
                ).astype(np.float32),
                "bias": rng.normal(
                    0, 0.1, (spec.out_h, spec.out_w, spec.filters)
                ).astype(np.float32)})
            continue
        if isinstance(spec, Shortcut):
            # darknet inits shortcut blend weights to exactly 1
            # (make_shortcut_layer) — and this function seeds the
            # PRODUCTION partial-init tail (cli train), so it must
            # match; parity tests that need non-trivial blends
            # overwrite params[i]["weights"] explicitly
            per = 1 if spec.weights_type == "per_feature" else ic
            params.append({"weights": np.ones((2, per), np.float32)})
            continue
        conv = spec
        oc, k = conv.filters, conv.size
        if oc % conv.groups or ic % conv.groups:
            raise ValueError(
                f"conv {len(params)}: groups={conv.groups} must divide "
                f"filters={oc} and in_channels={ic}")
        ic = ic // conv.groups
        p = {"kernel": rng.normal(0, scale, (k, k, ic, oc)).astype(np.float32)}
        if conv.bn:
            p["gamma"] = rng.uniform(0.5, 1.5, oc).astype(np.float32)
            p["beta"] = rng.normal(0, 0.1, oc).astype(np.float32)
            p["mean"] = rng.normal(0, 0.1, oc).astype(np.float32)
            p["var"] = rng.uniform(0.5, 1.5, oc).astype(np.float32)
        else:
            p["bias"] = rng.normal(0, 0.1, oc).astype(np.float32)
        params.append(p)
    return params


def to_bytes(layers: Sequence[LayerSpec], params, seen: int = 0,
             version=(0, 2, 0)) -> bytes:
    bio = _io.BytesIO()
    save(bio, layers, params, seen=seen, version=version)
    return bio.getvalue()
