"""Reference .dill model-blob import (sources/reference_model.py).

The blobs are crafted with stdlib pickle to match the reference's
``save_model`` layout (reference patternly/detection.py:166-243): dill
writes the same stream for a dict of plain data + by-reference classes.
The classes are registered under throwaway module names so the shim
unpickler exercises the real "module not installed here" path.
"""

import pickle
import sys
import types

import numpy as np
import pytest
from pyspark.sql import functions as F


def _fake_reference_modules():
    """Register patternly.detection + a zedsuite-ish quantizer module in
    sys.modules so pickling records their by-reference names."""
    pkg = types.ModuleType("patternly")
    det = types.ModuleType("patternly.detection")

    class AnomalyDetection:  # noqa: D401 - name is the contract
        pass

    class StreamingDetection:
        pass

    det.AnomalyDetection = AnomalyDetection
    det.StreamingDetection = StreamingDetection
    for klass in (AnomalyDetection, StreamingDetection):
        klass.__module__ = "patternly.detection"
        klass.__qualname__ = klass.__name__  # pickle-by-reference needs module scope
    pkg.detection = det

    zq = types.ModuleType("zedsuite.quantizer")

    class Quantizer:
        pass

    zq.Quantizer = Quantizer
    Quantizer.__module__ = "zedsuite.quantizer"
    Quantizer.__qualname__ = "Quantizer"

    zpkg = types.ModuleType("zedsuite")
    zpkg.quantizer = zq
    sys.modules["patternly"] = pkg
    sys.modules["patternly.detection"] = det
    sys.modules["zedsuite"] = zpkg
    sys.modules["zedsuite.quantizer"] = zq
    return det, zq


def _cleanup_modules():
    for m in ("patternly", "patternly.detection", "zedsuite", "zedsuite.quantizer"):
        sys.modules.pop(m, None)


def _write_blob(tmp_path, metadata):
    p = str(tmp_path / "model.dill")
    with open(p, "wb") as f:
        pickle.dump(metadata, f)
    return p


def test_reference_blob_roundtrip_predictions(spark, tmp_path):
    """Fit a model here, export its fitted state in the REFERENCE blob
    layout, import it back through the shim loader: predictions must be
    identical to the original model's."""
    from patternly_spark.detection import StreamingDetection
    from patternly_spark.pfsa.model import PFSA
    from patternly_spark.pfsa.simulate import simulate
    from patternly_spark.sources.reference_model import load_reference_model

    det_mod, _ = _fake_reference_modules()
    try:
        machine_a = PFSA(pitilde=[[0.9, 0.1], [0.1, 0.9]], connx=[[0, 1], [1, 0]])
        machine_b = PFSA(pitilde=[[0.2, 0.8], [0.8, 0.2]], connx=[[0, 1], [1, 0]])
        seq_a = simulate(machine_a, 5000, 1, seed=3)[0]
        seq_b = simulate(machine_b, 2000, 1, seed=5)[0]

        train = spark.createDataFrame(
            [(i, int(s)) for i, s in enumerate(seq_a)], "offset long, symbol int"
        )
        both = spark.createDataFrame(
            [(i, int(s)) for i, s in enumerate(list(seq_a) + list(seq_b))],
            "offset long, symbol int",
        )
        fitted = StreamingDetection(
            spark, window_size=250, window_overlap=0, quantize=False,
            anomaly_sensitivity=3,
        ).fit(train)
        want = [
            (r["seq_id"], r["anomaly"])
            for r in fitted.predict(both).orderBy("seq_id").collect()
        ]

        # export in the reference save_model layout
        metadata = {
            "modeltype": det_mod.StreamingDetection,
            "user_params": {
                "anomaly_sensitivity": 3,
                "n_clusters": len(fitted.library),
                "reduce_clusters": True,
                "clustering_alg": None,
                "quantize": False,
                "quantize_type": "complex",
                "eps": 0.1,
                "verbose": False,
            },
            "fitted_params": {
                "quantizer_parameters": None,
                "quantizer_feature_order": None,
                "cluster_labels": None,
                "cluster_counts": fitted.cluster_counts,
                "cluster_PFSA_info": [
                    {
                        "%ANN_ERR": m.ann_err,
                        "%MRG_EPS": m.mrg_eps,
                        "%SYN_STR": m.syn_str,
                        "%SYM_FRQ": None if m.sym_frq is None else np.asarray(m.sym_frq),
                        "%PITILDE": np.asarray(m.pitilde),
                        "%CONNX": np.asarray(m.connx),
                    }
                    for m in fitted.library
                ],
                "PFSA_llk_means": fitted.pfsa_llk_means.tolist(),
                "PFSA_llk_stds": fitted.pfsa_llk_stds.tolist(),
            },
        }
        path = _write_blob(tmp_path, metadata)
    finally:
        _cleanup_modules()

    # import with the reference modules ABSENT (the real migration case)
    model, report = load_reference_model(spark, path, window_size=250)
    assert type(model).__name__ == "StreamingDetection"
    assert model.fitted and len(model.library) == len(fitted.library)
    got = [
        (r["seq_id"], r["anomaly"])
        for r in model.predict(both).orderBy("seq_id").collect()
    ]
    assert got == want
    assert not any("window_size" in r for r in report)  # explicitly provided


def test_reference_blob_opaque_fields_reported(spark, tmp_path):
    """Unresolvable fields (foreign clustering_alg instance, opaque
    quantizer parameters) must import as None with a report line, not
    crash — and partition cut-points hiding inside the opaque quantizer
    object must be recovered."""
    from patternly_spark.sources.reference_model import load_reference_model

    det_mod, zq_mod = _fake_reference_modules()
    try:
        alg = zq_mod.Quantizer()  # stands in for any foreign estimator
        alg.whatever = {"nested": [1, 2]}
        qparams = zq_mod.Quantizer()
        qparams.prune_levels = ["x"]
        qparams.partition_list = [[-0.25, 0.5]]
        metadata = {
            "modeltype": det_mod.AnomalyDetection,
            "user_params": {
                "anomaly_sensitivity": 1.0,
                "n_clusters": 1,
                "reduce_clusters": True,
                "clustering_alg": alg,
                "quantize": True,
                "quantize_type": "complex",
                "eps": 0.1,
                "verbose": False,
            },
            "fitted_params": {
                "quantizer_parameters": qparams,
                "quantizer_feature_order": [0],
                "cluster_labels": None,
                "cluster_counts": [7],
                "cluster_PFSA_info": [
                    {
                        "%ANN_ERR": 0.01,
                        "%MRG_EPS": 0.02,
                        "%SYN_STR": [0],
                        "%SYM_FRQ": np.array([0.5, 0.5]),
                        "%PITILDE": np.array([[0.7, 0.3], [0.4, 0.6]]),
                        "%CONNX": np.array([[0, 1], [1, 0]]),
                    }
                ],
                "PFSA_llk_means": [0.6],
                "PFSA_llk_stds": [0.05],
            },
        }
        path = _write_blob(tmp_path, metadata)
    finally:
        _cleanup_modules()

    model, report = load_reference_model(spark, path)
    assert type(model).__name__ == "AnomalyDetection"
    assert model.clustering_alg is None
    assert any("clustering_alg" in r for r in report)
    # cut-points recovered from the partition-named slot
    assert model.quantizer is not None and model.quantizer.cutpoints == [-0.25, 0.5]
    assert model.n_symbols == 3
    assert model.cluster_counts == [7]
    assert model.library[0].ann_err == pytest.approx(0.01)
    assert model.alphabet_size == 2


def test_reference_blob_rejects_garbage(spark, tmp_path):
    from patternly_spark.sources.reference_model import load_reference_model

    p = str(tmp_path / "junk.dill")
    with open(p, "wb") as f:
        pickle.dump([1, 2, 3], f)
    with pytest.raises(ValueError, match="reference patternly model blob"):
        load_reference_model(spark, p)
