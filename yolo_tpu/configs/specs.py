"""Layer-spec IR: a darknet-cfg-equivalent model description as frozen
dataclasses.

The reference family of repos hardcodes each graph in TF ops (SURVEY.md §2.1,
layout [UNVERIFIED]); here the topology is *data* interpreted by one
functional executor (models/graph.py). This keeps the darknet ``.weights``
loader generic (it walks Conv specs in file order — darknet ``parse.c``
save/load order) and makes every variant trivially testable against the same
oracle.

Semantics pinned by the darknet cfg format:
  * ``Conv``: conv2d (SAME padding when size>1, darknet pad=size//2),
    optional batch-norm, activation (leaky 0.1 or linear).
  * ``MaxPool``: darknet maxpool; ``size=2, stride=1`` pads one row/col at
    the *end* with -inf (SURVEY.md §7.2 parity trap).
  * ``Route``: channel concat of earlier layer outputs, in listed order,
    indices relative to the route layer (negative) exactly as darknet.
  * ``Reorg``: darknet ``reorg_cpu`` with forward=0 as used by yolov2.cfg's
    ``[reorg] stride=2`` — NOT space_to_depth (SURVEY.md §7.2).

YOLOv3-family extension (same darknet cfg/weights formats, beyond the
yolov2-only reference surface):
  * ``Conv`` may be strided (yolov3 downsamples with stride-2 convs, not
    maxpool).
  * ``Shortcut``: darknet ``[shortcut]`` — elementwise residual add of an
    earlier layer's output (``from`` index, darknet-relative), then
    activation (linear in every official cfg).
  * ``Upsample``: darknet ``[upsample]`` — nearest-neighbor x``stride``.
  * ``YoloHead``: darknet ``[yolo]`` — marks its INPUT as one detection
    head's logits; ``mask`` selects this head's anchors from the shared
    ``ModelConfig.anchors`` list (PIXEL units of the net input, unlike
    [region]'s cell units). The layer's routed output is its input
    (identity), preserving darknet layer indices for Route/Shortcut.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union


@dataclasses.dataclass(frozen=True)
class Conv:
    filters: int
    size: int = 3
    stride: int = 1
    bn: bool = True
    # "leaky" (slope 0.1) | "linear" | "mish" (yolov4) | "logistic"
    # (scaled-yolov4 head convs feeding new_coords [yolo] layers) |
    # "swish" (yolov4-csp-swish family)
    act: str = "leaky"
    # darknet [convolutional] groups (grouped/depthwise convolutions —
    # efficientnet/enet-style cfgs; groups == in_channels = depthwise).
    # Weights-file kernel is (oc, ic/groups, k, k), out = filters.
    groups: int = 1
    # darknet [convolutional] dilation (AlexeyAB): atrous convolution.
    # darknet applies padding = pad * dilation (its im2col/cudnn calls
    # both pass l.pad * l.dilation), which keeps the SAME output
    # geometry of the undilated conv; the parser forces dilation=1 for
    # size=1 kernels like darknet's parse_convolutional. Weight layout
    # is unchanged (same (oc, ic/groups, k, k) kernel, zeros are never
    # stored).
    dilation: int = 1


@dataclasses.dataclass(frozen=True)
class MaxPool:
    size: int = 2
    stride: int = 2


@dataclasses.dataclass(frozen=True)
class Route:
    # Relative indices into the layer list (negative, darknet-style).
    layers: Tuple[int, ...]
    # darknet [route] groups/group_id (yolov4 CSP): after concatenation,
    # keep channel slice group_id of groups equal parts.
    groups: int = 1
    group_id: int = 0


@dataclasses.dataclass(frozen=True)
class Reorg:
    stride: int = 2


@dataclasses.dataclass(frozen=True)
class Shortcut:
    """darknet [shortcut] `from` index (negative = relative, else
    absolute). Channel-count mismatches follow shortcut_cpu: the add
    covers min(c1, c2) channels and the rest passes through (the
    partial-residual / yolov3-tiny-prn family); output keeps the
    input's channel count.

    WEIGHTED shortcuts (AlexeyAB weights_type=per_feature|per_channel,
    the scaled-yolov4 csp-x-family key): the layer carries LEARNED
    blend weights in the .weights file — nweights = 2 for per_feature
    (one scalar per merged input: [w_in, w_from]) or 2*C for
    per_channel (group-major: [w_in[0..C), w_from[0..C)]), written in
    file order between the surrounding conv blocks
    (save_shortcut_weights). Forward (blas.c shortcut_multilayer_cpu):
    out = in * W0 + from * W1 over the min-channel overlap, in * W0
    alone on passthrough channels, then the activation.
    weights_normalization rescales the blend weights per position
    BEFORE use: relu -> lrelu(w) / (1e-4 + sum lrelu(w_j)) with
    lrelu(w) = max(w, 0.001); softmax -> exp(w - max) /
    (1e-4 + sum exp(w_j - max)). NOTE: the reference tree is absent
    and this box has no network — the layout (group-major, file order)
    follows parser.c's save order and the forward follows
    shortcut_multilayer_cpu as recalled; both are pinned by byte-level
    + TF-parity tests here (tests/test_weighted_shortcut.py), and the
    normalization constants (eps 1e-4, lrelu floor 0.001) are
    documented as recall-pinned rather than source-cited."""
    frm: int
    act: str = "linear"
    # "none" | "per_feature" | "per_channel"
    weights_type: str = "none"
    # "none" | "relu" | "softmax"
    weights_norm: str = "none"


@dataclasses.dataclass(frozen=True)
class Sam:
    # darknet [sam] (AlexeyAB sam_layer, yolov4-sam-* cfgs): spatial
    # attention — elementwise MULTIPLY of this layer's input with an
    # earlier layer's same-shape output (`from` index, darknet-relative),
    # then activation (linear in the official cfgs).
    frm: int
    act: str = "linear"


@dataclasses.dataclass(frozen=True)
class ScaleChannels:
    # darknet [scale_channels] (AlexeyAB scale_channels_layer, the SE /
    # squeeze-excitation multiply): output = from_layer_output * input,
    # where the INPUT is the small attention tensor — (B, 1, 1, C) after
    # an [avgpool]+1x1-conv SE branch when scale_wh=0 (channel scaling),
    # or (B, H, W, 1) when scale_wh=1 (spatial scaling) — broadcast over
    # the from layer's full extent; then activation. The output adopts
    # the FROM layer's shape (scale_channels_layer.c out_w/out_h/out_c).
    frm: int
    scale_wh: int = 0
    act: str = "linear"


@dataclasses.dataclass(frozen=True)
class Upsample:
    # darknet [upsample]: nearest-neighbor x stride; the optional
    # scale key multiplies the VALUES (upsample_layer.c l.scale,
    # default 1 — yolov3 cfgs never set it, kept for cfg completeness)
    stride: int = 2
    scale: float = 1.0


@dataclasses.dataclass(frozen=True)
class AvgPool:
    """darknet [avgpool]: GLOBAL average pool (avgpool_layer.c squashes
    the full H x W extent to 1 x 1 per channel, no size/stride keys).
    The executor keeps the output 4D (B, 1, 1, C) so 1x1 convs and
    channel-broadcast layers downstream work unchanged."""


@dataclasses.dataclass(frozen=True)
class Connected:
    """darknet [connected]: dense layer (classifier cfgs — darknet53's
    1000-way output). Weights file layout (parser.c
    save_connected_weights): biases[out], then weights[out*in] row-major
    (out, in) — NOTE the order differs from conv, whose BN terms precede
    the kernel; BN connected layers would store scales/mean/var AFTER
    the weights, and no official classifier cfg uses them, so
    batch_normalize=1 on [connected] is rejected at parse time.
    darknet flattens the input in CHW order; the executor reproduces
    that — it matters for SPATIAL inputs (the yolov1 head's dense
    layers consume 7x7 maps). For spatial inputs the parser pins the
    flattened feature count in ``in_features`` (the weight size depends
    on the cfg input size, so such models cannot be resized);
    in_features=None means the input is 1x1-spatial and features ==
    channels (the classifier-family case)."""
    out: int
    act: str = "linear"
    in_features: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class Dropout:
    """darknet [dropout]: identity at inference (darknet's test-mode
    forward); under training the executor applies darknet's inverted
    dropout exactly (dropout_layer: zero with prob, survivors scaled
    by 1/(1-prob)), with deterministic per-step masks keyed on the
    train step (models/graph.apply_layers dropout_rng)."""
    prob: float = 0.5


@dataclasses.dataclass(frozen=True)
class Crop:
    """darknet [crop] (the yolov1 input layer — crop_layer.c
    forward_crop_layer): the output is ``input*2 - 1`` unless
    noadjust=1 (darknet's v1 nets see [-1, 1] inputs — applied in BOTH
    train and test modes). Test mode center-crops to
    (crop_height, crop_width) with no flip; train mode draws ONE
    random (dy, dx) offset and one flip decision PER BATCH (darknet
    calls rand() once per forward, not per image) — every official v1
    cfg crops to the full [net] size, collapsing the offsets to 0.
    darknet's CPU forward ignores the [crop] angle/saturation/exposure
    keys (they are GPU-kernel jitter only), and so do we.
    NOTE: semantics recalled from crop_layer.c; the reference tree is
    absent and the box has no network, so this is pinned by our own
    unit tests rather than a source citation."""
    crop_h: int
    crop_w: int
    flip: bool = False
    noadjust: bool = False


@dataclasses.dataclass(frozen=True)
class Local:
    """darknet [local] (locally-connected conv — the yolov1 head):
    per-output-position UNSHARED filters (local_layer semantics), out
    (H', W', filters), darknet pad flag (=> size//2), always biased,
    no BN. Weight-file block: biases[outputs = H'*W'*filters] in CHW
    order, then location-major per-position filter blocks
    (filters, in_c, k, k) — derived from the darknet format (parser
    save order + the im2col (c, ky, kx) patch order); the reference
    tree is absent, so this layout is format-derived and pinned by
    round-trip + TF LocallyConnected2D parity tests, not official
    bytes. The spatial geometry (out_h/out_w/in_c) is pinned at cfg
    parse because the weight size depends on it — models with [local]
    cannot be resized (with_input_size rejects)."""
    filters: int
    size: int = 3
    stride: int = 1
    pad: bool = True   # darknet pad key: pad=1 -> size//2 zero padding
    act: str = "leaky"
    out_h: int = 0
    out_w: int = 0
    in_c: int = 0


@dataclasses.dataclass(frozen=True)
class DetectionHead:
    """darknet [detection] (the yolov1 head): marks its INPUT — the
    final [connected] layer's side*side*(classes + num*(1+coords))
    activations — as the v1 detection tensor. Flat buffer layout
    (detection_layer get_detection_boxes, format-derived):
    [side²·classes class probs][side²·num confidences]
    [side²·num·coords boxes], boxes decoded as
    x=(tx+col)/side, y=(ty+row)/side, w=tw² h=th² (sqrt=1, the paper's
    sqrt-wh parameterization; tw/th directly when sqrt=0);
    score = confidence · class prob.

    Training (train/loss.detection_loss) is the PAPER's multi-part sum
    (arXiv:1506.02640 eq. 3): per object cell the max-IoU predictor is
    responsible — coord_scale (λcoord) weights its xy + sqrt-wh squared
    errors, its confidence targets the live IoU (rescore=1) or 1,
    every NON-responsible predictor pays noobject_scale (λnoobj) on its
    confidence, and the CELL's class probs pay a squared error. The
    scale keys mirror the darknet [detection] cfg keys; [crop] training
    jitter is NOT reproduced (center crop at train too — documented
    deviation, see Crop)."""
    side: int
    num: int
    classes: int
    sqrt: bool = True
    coords: int = 4
    rescore: bool = False
    # paper λs (darknet [detection] keys): coord 5, noobject 0.5
    object_scale: float = 1.0
    noobject_scale: float = 0.5
    class_scale: float = 1.0
    coord_scale: float = 5.0


@dataclasses.dataclass(frozen=True)
class SoftmaxHead:
    """darknet [softmax] (groups=1): marks the model as a CLASSIFIER;
    the executor applies softmax over the flattened input and returns
    (B, num_classes) probabilities. A trailing [cost] section in the
    cfg is parsed and ignored (loss marker, no forward effect).

    tree ([softmax] tree=<file>, the darknet9000/imagenet-9k
    classifier): the output becomes the YOLO9000 CONDITIONAL
    probabilities (one softmax per sibling group —
    ops/decode.tree_conditional_probs); consumers turn them into
    leaf-masked absolute probs for top-k (models/classify
    hierarchy_leaf_probs)."""
    tree: Optional[object] = None   # configs.tree.SoftmaxTree
    # [softmax] temperature=T (darknet softmax_layer): logits are
    # divided by T before the (tree-)softmax — T>1 softens the
    # distribution; training divides the same way, so the CE gradient
    # carries the 1/T factor darknet's backward does
    temperature: float = 1.0


@dataclasses.dataclass(frozen=True)
class YoloHead:
    # Indices into ModelConfig.anchors for this head's anchor subset.
    mask: Tuple[int, ...]
    # darknet [yolo] scale_x_y (yolov4 grid-sensitivity fix):
    # bx = (sigmoid(tx)*s - (s-1)/2 + cx) / W
    scale_xy: float = 1.0
    # AlexeyAB per-[yolo]-layer training options (None = unset, fall
    # back to YoloLossConfig's globals; an explicit 0.0 disables):
    # max_delta clamps this head's per-image box delta;
    # label_smooth_eps smooths this head's class targets
    max_delta: Optional[float] = None
    label_smooth_eps: Optional[float] = None
    # scaled-yolov4 [yolo] new_coords=1: the preceding conv carries
    # activation=logistic, so the head input is already sigmoided
    # everywhere; decode becomes bx = (v*s - (s-1)/2 + cx)/W and
    # bw = 4*v^2*anchor/net (AlexeyAB yolo_layer.c get_yolo_box) with
    # raw conf/class values. Training uses 0.5*MSE deltas on the
    # activations + an iou-family box loss (train/loss.py::yolo_loss).
    new_coords: bool = False
    # [Gaussian_yolo] (AlexeyAB gaussian_yolo_layer.c, the Gaussian
    # YOLOv3 localization-uncertainty head): per-anchor channel layout
    # INTERLEAVES mean and sigma — [x, ux, y, uy, w, uw, h, uh, obj,
    # classes...] (9+C, not 5+C); get_gaussian_yolo_box reads x/y/w/h
    # at entries 0/2/4/6 and the uncertainties sit at 1/3/5/7. Box math
    # matches [yolo] (sigmoid xy with scale_x_y, exp wh on pixel
    # anchors); detection score = sigmoid(obj) * sigmoid(class)
    # * (1 - mean(sigmoid(uc))) — get_gaussian_yolo_detections'
    # uc_aver term. Training runs the PAPER's per-coordinate Gaussian
    # NLL (arXiv:1904.04620; train/loss.gaussian_nll) over the encoded
    # targets with sigma = sigmoid(u) — the paper, not darknet's delta
    # file, is the pinned source (reference absent).
    gaussian: bool = False


LayerSpec = Union[Conv, MaxPool, Route, Reorg, Shortcut, Sam,
                  ScaleChannels, Upsample, AvgPool, Connected, Dropout,
                  Crop, Local, DetectionHead, SoftmaxHead, YoloHead]


def conv_specs(layers: Tuple[LayerSpec, ...]) -> Tuple[Conv, ...]:
    """Conv layers in darknet file order (the weights-file walk order)."""
    return tuple(l for l in layers if isinstance(l, Conv))


def weighted_specs(layers: Tuple[LayerSpec, ...]
                   ) -> Tuple[Union[Conv, Connected, Local,
                                    Shortcut], ...]:
    """Weight-carrying layers (Conv + Connected + Local + WEIGHTED
    Shortcut) in darknet file order — the .weights walk order AND the
    params-list order consumed by models/graph.apply_layers."""
    return tuple(l for l in layers
                 if isinstance(l, (Conv, Connected, Local))
                 or (isinstance(l, Shortcut)
                     and l.weights_type != "none"))


def resolve_route(idx: int, rel: int) -> int:
    """Resolve a darknet route index relative to layer position ``idx``."""
    return idx + rel if rel < 0 else rel


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """One model variant: topology + anchors + postprocess defaults.

    Mirrors the reference's config surface (SURVEY.md §2.1 'Config':
    model variant, input size, anchors, class names, thresholds).
    """

    name: str
    layers: Tuple[LayerSpec, ...]
    # (pw, ph): cell units for the [region] head (yolov2 family);
    # PIXEL units of the net input for [yolo] heads (yolov3 family).
    anchors: Tuple[Tuple[float, float], ...]
    class_names: Tuple[str, ...]
    # [net] height (and width too when input_width is None — the square
    # case every pinned variant uses). Rectangular darknet cfgs
    # ([net] width != height, a normal AlexeyAB video workflow) set
    # input_width; geometry consumers read input_h/input_w/input_hw.
    input_size: int = 416
    input_width: Optional[int] = None
    # [net] channels — 3 (RGB, every published detector) or 1
    # (grayscale: darknet-OpenCV loads with cv2.IMREAD_GRAYSCALE,
    # BT.601 luma; our host loaders do the same). The graph executor,
    # weights walk, letterbox, and decode are channel-generic; this
    # field sizes the first conv's kernel and selects the host decode
    # mode. Other counts reject at parse (darknet's OpenCV image
    # loader itself only supports 1 or 3).
    in_channels: int = 3
    conf_threshold: float = 0.5
    nms_threshold: float = 0.45
    bn_eps: float = 1e-5  # pinned; see SURVEY.md §3.4 note
    # [yolo] training hyperparameters (unused by the region family):
    # objectness ignore band; box-regression loss kind
    # (mse | iou | giou | diou | ciou) and its yolov4 normalizers
    ignore_thresh: float = 0.7
    iou_loss: str = "mse"
    iou_normalizer: float = 1.0
    cls_normalizer: float = 1.0
    # None = classic semantics; a float = the modern AlexeyAB split
    # (obj_normalizer scales objectness, cls_normalizer the class BCE)
    obj_normalizer: Optional[float] = None
    # AlexeyAB [yolo] iou_thresh: anchors above this wh-IoU with a
    # truth are ALSO assigned (1.0 = best-anchor-only, darknet default)
    assign_iou_thresh: float = 1.0
    # AlexeyAB [yolo] objectness_smooth (scaled-yolov4 cfgs set 1):
    # IoU-derived objectness targets with delta max-merging; parsed so
    # cfgs round-trip and TRAINING can reject it loudly (no reference
    # source to pin the semantics) — inference ignores it, as darknet's
    # forward pass does
    objectness_smooth: bool = False
    # AlexeyAB [yolo] focal_loss=1: the class term becomes the focal
    # loss (Lin et al. arXiv:1708.02002) with darknet's constants
    # gamma=2, alpha=0.5 — the PAPER's elementwise sigmoid focal form
    # is the pinned source (reference absent); inference ignores it
    focal_loss: bool = False
    # [yolo] truth_thresh (yolo_layer.c per-position pass): anchors
    # whose best PREDICTED-box IoU against any truth exceeds it train
    # as positives toward that truth (obj target 1, class, box) in
    # addition to the best-anchor assignment; 1.0 (every published
    # cfg) disables — IoU never exceeds 1
    truth_thresh: float = 1.0
    # [region] thresh (yolov2 family): the training noobj suppression
    # threshold (LossConfig.iou_thresh); darknet default 0.6
    region_thresh: float = 0.6
    # [region] training-loss scales + rescore (region_layer.c deltas).
    # Dataclass defaults are the OFFICIAL yolov2 cfg values
    # (object_scale=5, rescore=1) so the pinned variants train like
    # the published models; cfg parsing overrides them with darknet's
    # PARSE defaults (1/1/1/1/0, parser.c parse_region) for absent
    # keys, so a custom cfg trains exactly as darknet would run it.
    # They flow into train.loss.LossConfig via region_loss_config.
    region_object_scale: float = 5.0
    region_noobject_scale: float = 1.0
    region_class_scale: float = 1.0
    region_coord_scale: float = 1.0
    region_rescore: bool = True
    # AlexeyAB [yolo] nms_kind: "greedy" (greedynms/default) | "diou"
    # (diounms: suppression metric IoU - (d/c)^beta_nms, box.c
    # box_diounms); beta_nms is darknet's default 0.6
    nms_kind: str = "greedy"
    beta_nms: float = 0.6
    # YOLO9000 hierarchy ([region] tree=<file>): class logits are
    # soft-maxed per sibling group; decode either projects through
    # tree_map ([region] map=<file>, the COCO-eval projection — opt-in
    # via use_tree_map at the predict layer) or greedily descends the
    # tree while the path product stays above hier_thresh (darknet's
    # -hier flag default 0.5). tree_file/map_file keep the cfg's
    # verbatim path strings so cfg_to_string round-trips.
    tree: Optional["object"] = None          # configs.tree.SoftmaxTree
    tree_map: Optional[Tuple[int, ...]] = None
    tree_file: Optional[str] = None
    map_file: Optional[str] = None
    hier_thresh: float = 0.5

    @property
    def num_classes(self) -> int:
        return len(self.class_names)

    def num_detection_classes(self, use_tree_map: bool = False) -> int:
        """len(detection_names(...)) — one rule, stated once."""
        return len(self.detection_names(use_tree_map))

    @property
    def softmax_tree(self):
        """The hierarchy CLASSIFIER consumers must use: the SoftmaxHead
        layer's tree — the single source of truth training also reads
        (cfg-parsed models mirror it in .tree, but programmatic configs
        may set only the layer — code-review finding). None for
        non-classifier models and flat classifiers."""
        for l in self.layers:
            if isinstance(l, SoftmaxHead):
                return l.tree
        return None

    def detection_names(self, use_tree_map: bool = False
                        ) -> Tuple[str, ...]:
        """Display names for detection class indices. Under the map
        projection these are the mapped tree nodes' names."""
        if use_tree_map and self.tree_map is not None:
            return tuple(self.class_names[m] for m in self.tree_map)
        return self.class_names

    @property
    def num_anchors(self) -> int:
        return len(self.anchors)

    @property
    def input_h(self) -> int:
        """Net input height ([net] height)."""
        return self.input_size

    @property
    def input_w(self) -> int:
        """Net input width ([net] width; == height for square nets)."""
        return self.input_width if self.input_width is not None \
            else self.input_size

    @property
    def input_hw(self) -> Tuple[int, int]:
        """(net_h, net_w) — the shape-order geometry every op takes."""
        return (self.input_h, self.input_w)

    @property
    def grid_size(self) -> int:
        if self.input_width is not None \
                and self.input_width != self.input_size:
            raise ValueError(
                f"{self.name} is rectangular "
                f"({self.input_w}x{self.input_h}) — use grid_hw")
        return self.input_size // 32

    @property
    def grid_hw(self) -> Tuple[int, int]:
        """Region-head grid (gh, gw) = input_hw // 32."""
        return (self.input_h // 32, self.input_w // 32)

    @property
    def head_kind(self) -> str:
        """"region" (yolov2 [region], softmax classes, cell-unit anchors),
        "yolo" (yolov3 [yolo] multi-head, sigmoid classes, pixel-unit
        anchors), "detection" (yolov1 [detection] over a connected
        head, anchors empty), or "softmax" (darknet classifier:
        [softmax] over a global-pooled trunk, anchors empty) — derived
        from the layer list."""
        if any(isinstance(l, YoloHead) for l in self.layers):
            return "yolo"
        if any(isinstance(l, SoftmaxHead) for l in self.layers):
            return "softmax"
        if any(isinstance(l, DetectionHead) for l in self.layers):
            return "detection"
        return "region"

    @property
    def detection_head(self) -> Optional["DetectionHead"]:
        """The yolov1 [detection] spec (None for other families)."""
        for l in self.layers:
            if isinstance(l, DetectionHead):
                return l
        return None

    @property
    def yolo_heads(self) -> Tuple[YoloHead, ...]:
        """[yolo] layers in graph order (empty for the region family)."""
        return tuple(l for l in self.layers if isinstance(l, YoloHead))

    def with_input_size(self, size: int) -> "ModelConfig":
        """Square resize (the --input-size / multi-scale path). On a
        rectangular config this would silently change the aspect —
        rejected; use with_input_hw."""
        if self.input_width is not None and self.input_width != self.input_size:
            raise ValueError(
                f"{self.name} is rectangular ({self.input_w}x"
                f"{self.input_h}): with_input_size would square it — "
                f"use with_input_hw(h, w)")
        return self.with_input_hw(size, size)

    def with_input_hw(self, h: int, w: int) -> "ModelConfig":
        if h % 32 != 0 or w % 32 != 0:
            raise ValueError(
                f"input size must be a multiple of 32, got {w}x{h}")
        if any(isinstance(l, (Local, Crop)) for l in self.layers) or \
                any(isinstance(l, Connected) and l.in_features is not None
                    for l in self.layers):
            # spatial dense/local weights are sized by the cfg input —
            # resizing would desynchronize the .weights layout
            raise ValueError(
                f"{self.name} has a fixed input size "
                f"({self.input_size}): [local]/[crop]/spatial "
                f"[connected] weights are sized by it")
        return dataclasses.replace(
            self, input_size=h, input_width=None if w == h else w)
