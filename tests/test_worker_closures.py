"""Worker-closure self-containment guards (VERDICT r8 #3).

Every mapInPandas / pandas_udf closure in the package must be pickled
fully BY VALUE: a `purescript_ifrit_spark` import inside a nested
function runs on the EXECUTOR and silently reintroduces the
package-must-be-installed-worker-side requirement that the
`_make_*_decoder` factory pattern exists to avoid. Top-level function
bodies (depth 1) are driver-side and may import freely.

The r8 residual was exactly this: extract_video_stats and scene_changes
imported `decode_ppm_stream`, and audio_activity_stats imported
`decode_wav`, inside their worker `gen` closures. This test makes the
whole class of regression a hard failure.
"""

from __future__ import annotations

import ast
from pathlib import Path

PACKAGE = Path(__file__).resolve().parents[1] / "purescript_ifrit_spark"


def _nested_package_imports(path: Path) -> list:
    offenders = []
    tree = ast.parse(path.read_text())

    class V(ast.NodeVisitor):
        def __init__(self):
            self.depth = 0

        def _func(self, node):
            self.depth += 1
            self.generic_visit(node)
            self.depth -= 1

        visit_FunctionDef = _func
        visit_AsyncFunctionDef = _func
        visit_Lambda = _func

        def visit_ImportFrom(self, node):
            if self.depth >= 2 and (node.module or "").startswith(
                "purescript_ifrit_spark"
            ):
                offenders.append((str(path), node.lineno))

        def visit_Import(self, node):
            if self.depth >= 2 and any(
                a.name.startswith("purescript_ifrit_spark") for a in node.names
            ):
                offenders.append((str(path), node.lineno))

    V().visit(tree)
    return offenders


def test_no_package_imports_inside_nested_closures():
    offenders = []
    for p in sorted(PACKAGE.rglob("*.py")):
        offenders.extend(_nested_package_imports(p))
    assert offenders == [], (
        "package imports inside nested (worker-side) closures — use a "
        f"by-value _make_* factory instead: {offenders}"
    )


def test_by_value_stream_and_wav_decoders_match_module_level():
    """The factory twins must agree byte-for-byte with the module-level
    decoders they replace, on both the valid and the poison paths."""
    import numpy as np

    from purescript_ifrit_spark.operators.multimodal import (
        _make_ppm_decoder,
        _make_ppm_stream_decoder,
        _make_wav_decoder,
        decode_ppm,
        decode_ppm_stream,
        decode_wav,
    )

    def ppm(w, h, seed):
        raster = bytes(
            (seed + 7 * i) % 256 for i in range(w * h * 3)
        )
        return b"P6 %d %d 255\n" % (w, h) + raster

    stream = ppm(4, 3, 1) + ppm(2, 2, 9) + ppm(4, 3, 77)
    ref = decode_ppm_stream(stream)
    got = _make_ppm_stream_decoder()(stream)
    assert len(ref) == len(got) == 3
    for a, b in zip(ref, got):
        assert np.array_equal(a, b)
    assert np.array_equal(decode_ppm(ppm(5, 2, 3)), _make_ppm_decoder()(ppm(5, 2, 3)))
    # empty stream = zero frames on both
    assert decode_ppm_stream(b"") == [] == _make_ppm_stream_decoder()(b"")
    # trailing garbage raises on both
    for fn in (decode_ppm_stream, _make_ppm_stream_decoder()):
        try:
            fn(stream + b"xx")
            raise AssertionError("trailing garbage must raise")
        except ValueError:
            pass

    import struct

    data = struct.pack("<8h", 5, -5, 0, 100, -100, 32767, -32768, 1)
    wav = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, 16000, 64000, 4, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    r_rate, r_ch, r_s = decode_wav(wav)
    g_rate, g_ch, g_s = _make_wav_decoder()(wav)
    assert (r_rate, r_ch) == (g_rate, g_ch) == (16000, 2)
    assert np.array_equal(r_s, g_s)
    for bad in (None, b"RIFFxxxx", wav[:20], wav.replace(b"data", b"datx")):
        for fn in (decode_wav, _make_wav_decoder()):
            try:
                fn(bad)
                raise AssertionError(f"poison wav must raise: {bad!r:.30}")
            except ValueError:
                pass
