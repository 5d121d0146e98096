# -*- coding: utf-8 -*-
"""Arrow-batched (mapInPandas) multimodal operators — the Python-native
decode path for codecs that live in Python libraries (PIL, librosa,
decord, ...) rather than on the JVM.

The JVM path (``graft.multimodal.Multimodal`` via ``graft.pipeline``)
is the right seam for JNI codecs; THIS module is the seam for
Python-library codecs: payload batches cross the JVM->Python boundary
ONCE per Arrow batch (not per row), the decode function receives plain
``bytes`` and returns plain dicts, and the operator handles schema,
batching, and totality. The decode functions shipped here are REAL for
the two canonical formats the JVM codecs own (uncompressed 24-bit BMP
and mono 16-bit PCM WAV — fixed-offset header math, no external
libraries), so the pytest gate can assert byte-for-byte agreement with
the JVM codecs on the same payloads; anything else returns ``unknown``
(the ``MediaCodec`` totality contract: a corrupt asset must not kill a
100 TB scan). A real deployment swaps ``decode_fn`` for PIL/librosa —
the plumbing does not change.

Scale shape: ``mapInPandas`` is narrow (no shuffle); payload bytes
stream batch-wise through Arrow; metadata-only consumers should select
away the content column AFTER decode so the bytes are pruned from
everything downstream.
"""

import struct
import sys

# The decode closures below reference this module's functions; pickling
# them BY VALUE makes the shipped UDFs self-contained, so executors do
# not need the graft package on their PYTHONPATH (the client-side-only
# install this binding layer assumes everywhere else — only py4j
# handles cross the boundary elsewhere, but mapInPandas ships code).
try:
    from pyspark import cloudpickle as _cp  # Spark's vendored pickler
    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover — older pickler: fall back to
    pass           # by-reference (executors then need the package)

META_FIELDS = ("kind", "width", "height", "sample_rate", "duration_ms")
_META_DDL = ("kind string, width int, height int, "
             "sample_rate int, duration_ms long")

_UNKNOWN = {"kind": "unknown", "width": None, "height": None,
            "sample_rate": None, "duration_ms": None}


def decode_header(payload):
    """REAL pure-Python header decode for canonical 24-bit BMP and mono
    16-bit PCM WAV (the formats graft's JVM codecs own) -> meta dict;
    anything else -> the ``unknown`` row. Total: never raises."""
    try:
        b = bytes(payload) if payload is not None else b""
        if len(b) >= 54 and b[:2] == b"BM" and \
                struct.unpack("<I", b[14:18])[0] == 40:
            w, h = struct.unpack("<ii", b[18:26])
            planes, bpp = struct.unpack("<HH", b[26:30])
            comp = struct.unpack("<I", b[30:34])[0]
            off = struct.unpack("<I", b[10:14])[0]
            row = (w * 3 + 3) & ~3
            if (0 < w <= 1 << 20 and 0 < h <= 1 << 20 and planes == 1
                    and bpp == 24 and comp == 0 and 54 <= off
                    and off + row * h <= len(b)):
                return {"kind": "image", "width": w, "height": h,
                        "sample_rate": None, "duration_ms": None}
        if len(b) >= 44 and b[:4] == b"RIFF" and b[8:16] == b"WAVEfmt ":
            fmt_len, pcm, ch, rate, brate, align, bits = \
                struct.unpack("<IHHIIHH", b[16:36])
            dsize = struct.unpack("<I", b[40:44])[0]
            if (fmt_len == 16 and pcm == 1 and ch == 1 and 0 < rate <= 2000000
                    and brate == rate * 2 and align == 2 and bits == 16
                    and b[36:40] == b"data" and dsize % 2 == 0
                    and 44 + dsize <= len(b)
                    and struct.unpack("<I", b[4:8])[0] == 36 + dsize):
                return {"kind": "audio", "width": None, "height": None,
                        "sample_rate": rate,
                        "duration_ms": (dsize // 2) * 1000 // rate}
        return dict(_UNKNOWN)
    except Exception:
        return dict(_UNKNOWN)


def decode_meta_pandas(df, content_col="content", decode_fn=decode_header):
    """Append meta columns (kind, width, height, sample_rate,
    duration_ms) decoded by a PYTHON function over Arrow batches.

    ``decode_fn(bytes) -> dict`` runs once per row but is called from a
    per-BATCH loop (pandas in, pandas out) — the shape a vectorized or
    C-extension codec needs: bind the library once per batch iterator
    (the commented line), then decode rows without re-crossing the
    py4j boundary."""
    import pandas as pd  # local import: executor-side dependency only

    out_schema = df.schema.simpleString()[7:-1]  # strip struct<...>
    schema = ", ".join(
        [f.name + " " + f.dataType.simpleString() for f in df.schema.fields]
        + _META_DDL.split(", "))

    def batches(it):
        # per-iterator codec initialization would happen here (PIL etc.)
        for pdf in it:
            metas = [decode_fn(v) for v in pdf[content_col]]
            for name in META_FIELDS:
                pdf[name] = pd.Series(
                    [m[name] for m in metas], index=pdf.index, dtype="object")
            yield pdf

    return df.mapInPandas(batches, schema=schema)


def byte_histogram_pandas(df, content_col="content", out_col="histogram"):
    """256-bin byte histogram per payload, computed batch-wise in numpy
    (``np.bincount`` over the raw buffer) — the vectorized-feature
    shape: one Arrow batch in, one numeric feature column out."""
    import numpy as np

    schema = ", ".join(
        [f.name + " " + f.dataType.simpleString() for f in df.schema.fields]
        + [out_col + " array<bigint>"])

    def batches(it):
        for pdf in it:
            pdf[out_col] = [
                np.bincount(
                    np.frombuffer(bytes(v), dtype=np.uint8), minlength=256
                ).astype("int64").tolist() if v is not None else [0] * 256
                for v in pdf[content_col]]
            yield pdf

    return df.mapInPandas(batches, schema=schema)
