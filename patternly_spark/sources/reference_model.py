"""Import a reference ``patternly`` dill model blob into this engine.

The reference persists fitted models with ``dill.dump`` of a plain
metadata dict (reference ``patternly/detection.py:166-243``):

    {"modeltype": <class patternly.detection.AnomalyDetection|StreamingDetection>,
     "user_params": {anomaly_sensitivity, n_clusters, reduce_clusters,
                     clustering_alg, quantize, quantize_type, eps, verbose},
     "fitted_params": {quantizer_parameters, quantizer_feature_order,
                       cluster_labels, cluster_counts, cluster_PFSA_info,
                       PFSA_llk_means, PFSA_llk_stds}}

where ``cluster_PFSA_info`` is one dict per cluster PFSA with the
``%ANN_ERR %MRG_EPS %SYN_STR %SYM_FRQ %PITILDE %CONNX`` keys (reference
``detection.py:56,393``).  dill writes classes BY REFERENCE (standard
pickle GLOBAL opcodes), so the blob is readable without dill — IF the
referenced modules exist.  They don't here (no ``patternly``, no
``zedsuite``, no ``sklearn``), so ``load_reference_model`` unpickles
with a shim ``find_class``: numpy/stdlib containers resolve for real,
everything else becomes an inert placeholder type that records its
module/name and swallows state.  No foreign code ever executes — safer
than a stock unpickle, and it tolerates blobs whose classes came from
packages this environment has never seen.

Field mapping into this engine:

- ``%PITILDE/%CONNX/%SYM_FRQ/%SYN_STR/%ANN_ERR/%MRG_EPS`` -> ``pfsa.model.PFSA``
- ``PFSA_llk_means/stds`` -> ``pfsa_llk_means/stds`` (ddof=1 z-score gate)
- ``cluster_counts`` -> ``cluster_counts``; alphabet = len(%SYM_FRQ)
- ``quantizer_parameters`` -> best-effort cut-point recovery (the
  zedsuite Quantizer stores its partition boundaries inside an opaque
  object; every float list found under a ``partition``-named slot is
  treated as the cut-point vector).  When no cut-points are found the
  model imports with ``quantizer=None`` — predictions then need
  pre-quantized symbol input, and the import report says so.
- ``clustering_alg`` placeholders (e.g. a pickled sklearn estimator)
  import as None: the fitted model never re-clusters at predict time,
  so this only matters for re-fitting, which a migrated model shouldn't
  do with a foreign estimator anyway.
"""

from __future__ import annotations

import io
import pickle
from typing import Any

import numpy as np

__all__ = ["load_reference_model", "read_reference_blob"]

_REAL_MODULE_PREFIXES = ("numpy",)
_REAL_BUILTINS = {
    "builtins": {
        "dict", "list", "tuple", "set", "frozenset", "str", "bytes",
        "int", "float", "complex", "bool", "bytearray", "slice", "range",
        "object", "NoneType",
    },
    "collections": {"OrderedDict", "defaultdict", "deque"},
}


class _Placeholder:
    """Inert stand-in for any class the blob references by name: accepts
    construction, __setstate__ and attribute writes; executes nothing."""

    _module = _name = ""

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        self._args, self._kwargs = args, kwargs

    def __setstate__(self, state: Any) -> None:
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<placeholder {self._module}.{self._name}>"


class _ShimUnpickler(pickle.Unpickler):
    def find_class(self, module: str, name: str):
        if module.split(".")[0] in _REAL_MODULE_PREFIXES:
            return super().find_class(module, name)
        allowed = _REAL_BUILTINS.get(module)
        if allowed and name in allowed:
            return super().find_class(module, name)
        return type(
            f"_Ref_{name}", (_Placeholder,), {"_module": module, "_name": name}
        )


def read_reference_blob(path: str) -> dict:
    """Unpickle a reference .dill blob with the shim loader; returns the
    raw metadata dict (classes appear as placeholder types)."""
    with open(path, "rb") as f:
        blob = _ShimUnpickler(io.BytesIO(f.read())).load()
    if not isinstance(blob, dict) or "fitted_params" not in blob:
        raise ValueError(
            f"{path} does not look like a reference patternly model blob "
            f"(top-level {type(blob).__name__})"
        )
    return blob


def _find_partitions(obj: Any, depth: int = 0) -> list[float] | None:
    """Recursive best-effort hunt for the quantizer's partition
    (cut-point) vector inside the opaque zedsuite parameters object."""
    if depth > 6 or obj is None:
        return None
    if isinstance(obj, (list, tuple, np.ndarray)):
        seq = list(obj)
        if seq and all(isinstance(x, (int, float, np.floating, np.integer)) for x in seq):
            return [float(x) for x in seq]
        for item in seq:
            found = _find_partitions(item, depth + 1)
            if found:
                return found
        return None
    mapping = obj if isinstance(obj, dict) else getattr(obj, "__dict__", None)
    if not mapping:
        return None
    # partition-named slots first, then anything else
    keys = sorted(mapping, key=lambda k: (0 if "partition" in str(k).lower() else 1, str(k)))
    for k in keys:
        if "partition" in str(k).lower():
            found = _find_partitions(mapping[k], depth + 1)
            if found:
                return found
    for k in keys:
        if "partition" not in str(k).lower():
            found = _find_partitions(mapping[k], depth + 1)
            if found:
                return found
    return None


def load_reference_model(spark, path: str, *, window_size: int | None = None,
                         window_overlap: int = 0):
    """Migrate a reference ``patternly`` .dill model blob into a fitted
    engine model (``AnomalyDetection`` or ``StreamingDetection``,
    matching the blob's ``modeltype``).

    The reference's own ``load_model`` drops window parameters (its
    ``user_params`` never stored them — reference ``detection.py:218-222``
    reconstructs ``StreamingDetection(**user_params)`` with default
    windows); pass ``window_size``/``window_overlap`` to set them here.

    Returns ``(model, report)`` — ``report`` lists fields that could not
    be migrated (opaque clustering_alg, unrecovered quantizer
    cut-points) so callers can decide whether the import is sufficient.
    """
    from patternly_spark.detection import AnomalyDetection, StreamingDetection
    from patternly_spark.functions.quantize import Quantizer
    from patternly_spark.pfsa.model import PFSA

    blob = read_reference_blob(path)
    user = dict(blob.get("user_params", {}))
    fitted = blob.get("fitted_params", {})
    report: list[str] = []

    modeltype = blob.get("modeltype")
    type_name = getattr(modeltype, "_name", getattr(modeltype, "__name__", ""))
    is_streaming = type_name == "StreamingDetection"

    clustering_alg = user.pop("clustering_alg", None)
    if isinstance(clustering_alg, _Placeholder):
        report.append(
            f"clustering_alg {clustering_alg._module}.{clustering_alg._name} "
            "imported as None (only used when re-fitting)"
        )
        clustering_alg = None
    user.pop("verbose", None)

    kwargs = dict(
        anomaly_sensitivity=float(user.get("anomaly_sensitivity", 1.0)),
        n_clusters=int(user.get("n_clusters", 1)),
        reduce_clusters=bool(user.get("reduce_clusters", True)),
        clustering_alg=clustering_alg,
        quantize=bool(user.get("quantize", True)),
        quantize_type=str(user.get("quantize_type", "complex")),
        eps=float(user.get("eps", 0.1)),
    )
    if is_streaming:
        model = StreamingDetection(
            spark,
            window_size=int(window_size or 1000),
            window_overlap=int(window_overlap),
            **kwargs,
        )
        if window_size is None:
            report.append(
                "window_size not stored in reference blobs (reference "
                "load_model has the same hole); defaulted to 1000"
            )
    else:
        model = AnomalyDetection(spark, **kwargs)

    library: list[PFSA] = []
    for i, info in enumerate(fitted.get("cluster_PFSA_info") or []):
        syn = info.get("%SYN_STR")
        library.append(
            PFSA(
                pitilde=np.asarray(info["%PITILDE"], dtype=np.float64),
                connx=np.asarray(info["%CONNX"], dtype=np.int32),
                pfsa_id=i,
                ann_err=None if info.get("%ANN_ERR") is None else float(info["%ANN_ERR"]),
                mrg_eps=None if info.get("%MRG_EPS") is None else float(info["%MRG_EPS"]),
                syn_str=None if syn is None else [int(s) for s in syn],
                sym_frq=None if info.get("%SYM_FRQ") is None else np.asarray(info["%SYM_FRQ"], dtype=np.float64),
            )
        )
    if not library:
        raise ValueError(f"{path}: no cluster_PFSA_info — blob is not a fitted model")
    model.library = library
    model.n_clusters = len(library)
    model.alphabet_size = int(library[0].pitilde.shape[1])

    means = fitted.get("PFSA_llk_means")
    stds = fitted.get("PFSA_llk_stds")
    model.pfsa_llk_means = None if means is None else np.asarray(means, dtype=np.float64)
    model.pfsa_llk_stds = None if stds is None else np.asarray(stds, dtype=np.float64)
    counts = fitted.get("cluster_counts")
    model.cluster_counts = [int(c) for c in counts] if counts else []

    if model.quantize and model.quantize_type == "complex":
        cuts = _find_partitions(fitted.get("quantizer_parameters"))
        if cuts:
            model.quantizer = Quantizer(
                quantize_type="complex",
                n_symbols=len(cuts) + 1,
                cutpoints=[float(c) for c in cuts],
                fitted=True,
            )
            model.n_symbols = len(cuts) + 1
        else:
            model.quantizer = None
            report.append(
                "quantizer cut-points not recoverable from "
                "quantizer_parameters; predict() needs pre-quantized "
                "symbol input (quantize=False semantics)"
            )
            model.quantize = False

    model.fitted = True
    return model, report
