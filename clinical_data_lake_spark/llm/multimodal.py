"""Multimodal column operators — image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched pandas
iterators (``mapInPandas``), never row-at-a-time Python UDFs.

What is REAL here (no media libraries needed, runs in this container):
- the schema/plumbing: binary content + struct metadata, Arrow batch
  transfer, per-batch vectorized numpy work;
- container-header parsing (``probe_media_metadata``): PNG IHDR and
  JPEG SOF dimensions are read from raw bytes with pure struct math;
- byte-level featurization (``byte_histogram_features``): 256-bin
  histogram + Shannon entropy per blob — the standard cheap signal for
  corrupt/duplicate/compressed-content triage at corpus scale.

What is STUBBED (decode libraries are not in this container):
- pixel decode for ``resize_images`` and frame extraction for
  ``sample_frames`` fall back to a clearly-marked deterministic fake
  (seeded from the content hash) when PIL / an AV library is absent.
  The Spark-side contract — schemas, batch shapes, UDF signatures,
  partition hygiene — is identical with a real decoder plugged in.

Scale notes: binary blobs dominate row size. Project features BEFORE
any shuffle and drop the content column as early as possible; size scan
partitions with ``spark.sql.files.maxPartitionBytes`` so a batch of
blobs fits executor memory; never groupBy/join on a DataFrame that
still carries ``content``.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metadata struct carried alongside every blob
MEDIA_META_DDL = (
    "media_type string, width int, height int, n_bytes long, valid boolean"
)


def probe_media_metadata(
    df: DataFrame, content_col: str = "content", meta_col: str = "meta"
) -> DataFrame:
    """Attach a typed metadata struct parsed from the blob's container
    header (PNG IHDR / JPEG SOF0-3 / RIFF-WAVE, pure struct math).
    Arrow-batched: each pandas batch is probed in one Python call, not
    one call per row.

    NOTE every mapInPandas closure in this module is self-contained (no
    references to module-level helpers): cloudpickle serializes such
    references by module name, which breaks on executor Python workers
    that don't have this package on sys.path.
    """
    out_ddl = ", ".join(f"{c} {t}" for c, t in zip(
        df.columns, [f.dataType.simpleString() for f in df.schema.fields]
    ))
    schema = f"{out_ddl}, {meta_col} struct<{MEDIA_META_DDL}>"

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        def probe_one(data):
            if data is None:
                return ("unknown", None, None, 0, False)
            data = bytes(data)
            n = len(data)
            if n >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
                w, h = _struct.unpack(">II", data[16:24])
                return ("image/png", w, h, n, True)
            if n >= 4 and data[:2] == b"\xff\xd8":
                # full SOF set: 0xC0-0xCF minus DHT(C4)/JPG(C8)/DAC(CC),
                # so progressive (C2), arithmetic (C9-CB) etc. all parse
                sof = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}
                i = 2
                while i + 1 < n:
                    if data[i] != 0xFF:
                        break
                    while i + 1 < n and data[i + 1] == 0xFF:
                        i += 1  # 0xFF fill bytes may pad any marker
                    marker = data[i + 1]
                    if marker == 0xD9:
                        break  # EOI with no SOF seen
                    if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                        i += 2  # standalone markers carry no segment
                        continue
                    if i + 3 >= n:
                        break
                    seglen = _struct.unpack(">H", data[i + 2 : i + 4])[0]
                    if marker in sof:
                        if i + 9 <= n:
                            h, w = _struct.unpack(">HH", data[i + 5 : i + 9])
                            return ("image/jpeg", w, h, n, True)
                        break
                    if marker == 0xDA:
                        break  # entropy-coded data; SOF had to precede it
                    i += 2 + seglen
                return ("image/jpeg", None, None, n, False)
            if n >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
                return ("audio/wav", None, None, n, True)
            return ("application/octet-stream", None, None, n, True)

        for pdf in batches:
            metas = [probe_one(v) for v in pdf[content_col]]
            pdf = pdf.copy()
            pdf[meta_col] = [
                {"media_type": t, "width": w, "height": h, "n_bytes": nb, "valid": ok}
                for t, w, h, nb, ok in metas
            ]
            yield pdf

    return df.mapInPandas(probe, schema=schema)


def byte_histogram_features(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    bins: int = 64,
) -> DataFrame:
    """Per-blob byte histogram (``bins`` buckets, L1-normalized) +
    Shannon entropy (bits/byte): (id, n_bytes, entropy, features).

    Real computation (numpy over Arrow batches). The content column is
    dropped on output — downstream shuffles move ``bins`` floats per
    row, not megabyte blobs.
    """
    import numpy as np

    if bins < 1 or 256 % bins != 0:
        raise ValueError(f"bins must evenly divide 256, got {bins}")

    schema = f"{id_col} long, n_bytes long, entropy double, features array<float>"

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[content_col]):
                if data is None or len(data) == 0:
                    rows.append((int(mid), 0, 0.0, [0.0] * bins))
                    continue
                arr = np.frombuffer(data, dtype=np.uint8)
                hist256 = np.bincount(arr, minlength=256).astype(np.float64)
                p = hist256 / arr.size
                nz = p[p > 0]
                entropy = float(-(nz * np.log2(nz)).sum())
                hist = hist256.reshape(bins, 256 // bins).sum(axis=1) / arr.size
                rows.append((int(mid), int(arr.size), entropy,
                             [float(x) for x in hist]))
            yield pd.DataFrame(rows, columns=[id_col, "n_bytes", "entropy", "features"])

    return df.mapInPandas(feats, schema=schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Decode -> resize -> re-emit as flat pixel array:
    (id, width, height, pixels array<int>).

    Decode path: PIL when importable, else the deterministic fake
    (clearly marked; pixel VALUES are placeholders, everything else —
    batching, schema, memory shape — is production-true)."""
    try:
        from PIL import Image  # noqa: F401

        have_pil = True
    except Exception:
        have_pil = False

    schema = f"{id_col} long, width int, height int, pixels array<int>"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import io

        import numpy as np

        def fake_decode(data):
            # STUB decoder — deterministic pseudo-pixels seeded from the
            # content hash; pixel VALUES are placeholders, the batch
            # shape and schema are production-true.
            seed = int.from_bytes(
                hashlib.blake2s(bytes(data or b""), digest_size=8).digest(), "big"
            )
            rng = np.random.default_rng(seed)
            return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)

        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[content_col]):
                if have_pil:
                    from PIL import Image as _Image

                    img = _Image.open(io.BytesIO(data)).convert("RGB")
                    img = img.resize((width, height))
                    px = np.asarray(img, dtype=np.uint8)
                else:
                    px = fake_decode(data)
                rows.append((int(mid), width, height,
                             [int(x) for x in px.reshape(-1)[: width * height * 3]]))
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "pixels"])

    return df.mapInPandas(resize, schema=schema)


def sample_frames(
    df: DataFrame,
    n_frames: int,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Video frame sampling -> one row per sampled frame:
    (id, frame_idx, frame binary).

    STUB extraction: without an AV library the "frames" are evenly
    spaced byte slices of the container (deterministic, schema-true).
    A real decoder swaps into the same iterator; the exploded
    one-row-per-frame output shape — what downstream vision featurizers
    consume — is the contract being tested."""
    schema = f"{id_col} long, frame_idx int, frame binary"

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[content_col]):
                data = data or b""
                step = max(1, len(data) // n_frames)
                for k in range(n_frames):
                    rows.append((int(mid), k, data[k * step : k * step + step]))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame"])

    return df.mapInPandas(frames, schema=schema)


def synthesize_media_from_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic binary corpus for tests/benchmarks: UTF-8 encode of
    the text column as the blob (media_id, content). Pure column
    expressions — no Python."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
    )
