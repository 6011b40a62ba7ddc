"""Zoo-wide f32-poisoning audit: count f32 dot/conv ops in each
family's bf16 extraction graph.

The same bug class surfaced three times (WavLM round 3, ReDimNet round
4): an einsum with preferred_element_type=f32 feeding its result back
into the residual stream, after which the dtype-preserving norms keep
the ENTIRE downstream graph f32 — silently doubling HBM traffic and
losing the MXU's bf16 rate.  This audit lowers every benched family's
bf16 extraction graph (CPU lowering is fine; dtypes are
platform-independent) and counts stablehlo dot_general/convolution ops
by result dtype.

Expected clean state: exactly 2 f32 dots per family — the deliberate
f32 fbank frontend (matmul-DFT + mel projection, ops/fbank.py) — and
zero f32 convolutions or backbone dots.  Run off-TPU with
JAX_PLATFORMS=cpu; exits nonzero if any family regresses, so it can
ride in CI.
"""

import re
import sys

import jax

from perf_extract_trace import build

FAMILIES = [
    "ECAPA_TDNN_c512", "ECAPA_TDNN_GLOB_c1024", "XVEC", "ResNet34",
    "ResNet152", "ResNet293", "Res2Net34_Base", "ERes2Net34_Base",
    "CAMPPlus", "REPVGG_TINY_A0", "Gemini_DF_ResNet114", "ReDimNetB2",
    "SimAM_ResNet34_ASP", "XI_VEC_ECAPA_TDNN_c512",
]

# deliberate f32: the fbank matmul-DFT + mel projection (ops/fbank.py)
EXPECTED_F32_DOTS = 2

_PAT = re.compile(
    r"stablehlo\.(dot_general|convolution).*?->\s+tensor<([^>]*)>")


def audit_family(name, batch=8, seconds=2.0):
    run, wav = build(name, batch, seconds, "bf16")
    txt = run.lower(wav).as_text()
    counts = {"dot_f32": 0, "dot_bf16": 0, "conv_f32": 0, "conv_bf16": 0}
    f32_shapes = []
    for m in _PAT.finditer(txt):
        op, outty = m.group(1), m.group(2)
        kind = "dot" if op == "dot_general" else "conv"
        if outty.split("x")[-1].strip() == "f32":
            counts[f"{kind}_f32"] += 1
            f32_shapes.append((kind, outty))
        else:
            counts[f"{kind}_bf16"] += 1
    return counts, f32_shapes


def main():
    bad = []
    for name in FAMILIES:
        c, f32_shapes = audit_family(name)
        ok = c["conv_f32"] == 0 and c["dot_f32"] <= EXPECTED_F32_DOTS
        flag = "" if ok else "  <-- F32 POISONING"
        print(f"{name:26s} dot f32/bf16 = {c['dot_f32']}/{c['dot_bf16']:3d}"
              f"   conv f32/bf16 = {c['conv_f32']}/{c['conv_bf16']:3d}"
              f"{flag}", flush=True)
        if not ok:
            bad.append(name)
            for kind, s in f32_shapes[:10]:
                print(f"    f32 {kind}: {s}")
    if bad:
        print(f"FAIL: f32 compute beyond the fbank frontend in {bad}")
        return 1
    print("clean: only the deliberate f32 fbank dots in every family")
    return 0


if __name__ == "__main__":
    sys.exit(main())
