"""Regression guard for the f32-poisoning bug class (see
perf_dtype_audit.py and docs/PERF_NOTES.md round-4 audit).

Three separate times an einsum with preferred_element_type=f32 fed its
result back into the activation stream and the dtype-preserving norms
then kept the entire downstream graph f32 (WavLM round 3, ReDimNet
round 4 — reference counterparts wespeaker/frontend/s3prl.py,
wespeaker/models/redimnet.py run under torch autocast and cannot hit
this).  This test pins the clean state on a representative subset of
families: the only f32 dots in a bf16 extraction graph are the two
deliberate fbank-frontend matmuls (DFT + mel, ops/fbank.py), and there
are no f32 convolutions at all.  The full 14-family sweep lives in
perf_dtype_audit.py.
"""

import pytest

from perf_dtype_audit import EXPECTED_F32_DOTS, audit_family

# one per architectural style: 1-D TDNN, 2-D conv, reshaping/transformer
FAST_FAMILIES = ["ECAPA_TDNN_c512", "ResNet34", "CAMPPlus", "ReDimNetB2"]


@pytest.mark.parametrize("name", FAST_FAMILIES)
def test_bf16_graph_has_no_f32_compute(name):
    counts, f32_shapes = audit_family(name, batch=4, seconds=2.0)
    assert counts["conv_f32"] == 0, (
        f"{name}: f32 convolutions in the bf16 graph: {f32_shapes}")
    assert counts["dot_f32"] <= EXPECTED_F32_DOTS, (
        f"{name}: f32 dots beyond the fbank frontend: {f32_shapes}")
    # the graph really is bf16-dominant, not an empty match
    assert counts["conv_bf16"] + counts["dot_bf16"] > 5
