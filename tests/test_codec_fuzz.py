"""Corruption fuzz + differential checks for the hand-written codec
surface (VERDICT r6 #4).

`raster/jpeg.py` + `raster/codec.py` are the largest spec-parsing code in
the repo, and in production they sit behind ``decode_status`` — whose
contract is that ANY damaged payload CLASSIFIES (raises) instead of
hanging the executor, exhausting memory, or silently returning wrong
pixels. The fuzz here drives exactly that contract:

- seeded byte-level mutations (flips, zero/0xFF stomps, truncations,
  splices) of valid streams from the repo's own encoder matrix must
  either decode to a sane array or raise — within a wall-clock bound and
  without planet-sized allocations;
- where Pillow is importable, stdlib decodes of the encoder matrix are
  diffed against Pillow (bit-exact for lossless containers, PSNR-bounded
  for JPEG).

The mutation schedule is deterministic (fixed seed) so a found
counterexample reproduces; the encoder matrix mirrors the fixture
rotation profiles (fixtures.band_rows_from_orders).
"""

from __future__ import annotations

import signal
import threading
import zlib

import numpy as np
import pytest

from tiff_enrichment_pipeline_spark.raster import codec, jpeg

DECODE_TIMEOUT_S = 10
# a corrupt header must not provoke an allocation beyond ~64 MB; tracked
# via a numpy-side cap in the decoders (fuzz finding r7 if violated)
_H = _W = 64


def _pixels(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    smooth = rng.integers(0, 60000, (_H, _W)).astype(np.uint16)
    return smooth


class _Timeout(Exception):
    pass


def _decode_bounded(payload: bytes, fmt: str):
    """codec.decode with a hard wall-clock bound. SIGALRM interrupts the
    pure-Python decoder loops; numpy kernel calls between checks are
    short. Only usable from the main thread — pytest runs tests there."""
    if threading.current_thread() is not threading.main_thread():
        return codec.decode(payload, _W, _H, fmt)

    def _raise(signum, frame):
        raise _Timeout(f"decode exceeded {DECODE_TIMEOUT_S}s")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(DECODE_TIMEOUT_S)
    try:
        return codec.decode(payload, _W, _H, fmt)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _encoder_matrix() -> list[tuple[str, str, bytes]]:
    """(label, fmt, payload) across every stdlib-real container profile."""
    px = _pixels(7)
    px8 = (px >> 8).astype(np.uint8)
    out = [
        ("png", "png", codec.encode_png_u16(px)),
        ("raw", "raw-u16", codec.encode_raw_u16(px)),
        ("tiff-none", "tiff", codec.encode_tiff_u16(px, compression="none")),
        ("tiff-deflate", "tiff", codec.encode_tiff_u16(px)),
        ("tiff-lzw", "tiff", codec.encode_tiff_u16(px, compression="lzw")),
        (
            "tiff-tiled-lzw",
            "tiff",
            codec.encode_tiff_u16(px, compression="lzw", tile=16),
        ),
        (
            "bigtiff",
            "tiff",
            codec.encode_tiff_u16(px, bigtiff=True),
        ),
        (
            "tiff-rgb",
            "tiff-rgb",
            codec.encode_tiff_rgb(np.stack([px, px, px], axis=-1)),
        ),
        (
            "tiff-packbits",
            "tiff",
            codec.encode_tiff_u16(px, compression="packbits"),
        ),
        (
            "tiff-rgb-planar",
            "tiff-rgb",
            codec.encode_tiff_rgb(
                np.stack([px, px, px], axis=-1), planar=2,
                compression="packbits",
            ),
        ),
        (
            "tiff-jpeg-color",
            "tiff-rgb",
            codec.encode_tiff_jpeg_color(
                np.stack([px8, px8, px8], axis=-1).astype(np.uint8),
                subsampling="420",
            ),
        ),
        (
            "tiff-rgba",
            "tiff-rgb",
            codec.encode_tiff_rgba(
                np.stack([px8, px8, px8, px8], axis=-1).astype(np.uint8),
                compression="lzw",
            ),
        ),
        (
            "tiff-cmyk",
            "tiff-rgb",
            codec.encode_tiff_cmyk(
                np.stack([px8, px8, px8, px8], axis=-1).astype(np.uint8),
            ),
        ),
        (
            "tiff-palette",
            "tiff-rgb",
            codec.encode_tiff_palette(
                px8,
                np.arange(768, dtype=np.uint16).reshape(3, 256) * 77,
            ),
        ),
        ("jpeg-base", "jpeg", jpeg.encode_jpeg_gray(px8, quality=85)),
        (
            "jpeg-rgb-direct",
            "jpeg",
            jpeg.encode_jpeg_rgb_direct(
                np.stack([px8, px8, px8], axis=-1).astype(np.uint8)
            ),
        ),
        (
            "jpeg-12bit-color",
            "jpeg",
            jpeg.encode_jpeg_color_12bit(
                np.stack([px >> 4, px >> 4, px >> 4], axis=-1).astype(
                    np.uint16
                ),
                subsampling="420",
            ),
        ),
        (
            "jpeg-prog",
            "jpeg",
            jpeg.encode_jpeg_gray_progressive(px8, quality=85),
        ),
    ]
    return out


def _mutations(payload: bytes, rng: np.random.Generator, n: int):
    """Deterministic stream of damaged variants."""
    L = len(payload)
    for _ in range(n):
        kind = int(rng.integers(0, 5))
        b = bytearray(payload)
        if kind == 0:  # single-bit flip
            i = int(rng.integers(0, L))
            b[i] ^= 1 << int(rng.integers(0, 8))
        elif kind == 1:  # byte stomp 0x00/0xFF
            i = int(rng.integers(0, L))
            b[i] = 0x00 if rng.integers(0, 2) else 0xFF
        elif kind == 2:  # truncation
            b = b[: int(rng.integers(1, L))]
        elif kind == 3:  # 4-byte splice of random garbage
            i = int(rng.integers(0, max(1, L - 4)))
            b[i : i + 4] = bytes(rng.integers(0, 256, 4, dtype=np.uint8))
        else:  # stomp inside the header region (dims/offsets live there)
            i = int(rng.integers(0, min(64, L)))
            b[i] = int(rng.integers(0, 256))
        yield bytes(b)


@pytest.mark.parametrize(
    "label,fmt,payload",
    [pytest.param(*t, id=t[0]) for t in _encoder_matrix()],
)
def test_fuzz_decode_always_classifies(label, fmt, payload):
    """120 seeded mutations per profile: decode must return a (64,64)
    uint16 array or raise ValueError/NotImplementedError (the two
    classifiable outcomes) within the time bound. Anything else — hang,
    MemoryError from a corrupt dimension field, struct.error leaking
    through, interpreter crash — is a production quarantine escape."""
    # crc32, NOT hash(): str hashing is salted per process, which
    # made the mutant schedule nondeterministic across runs (r7)
    rng = np.random.default_rng(zlib.crc32(label.encode()))
    survived = 0
    for mutant in _mutations(payload, rng, 120):
        try:
            arr = _decode_bounded(mutant, fmt)
        except (ValueError, NotImplementedError):
            continue  # classified: corrupt / unsupported
        except _Timeout:
            pytest.fail(f"{label}: decode hung on a mutated stream")
        except MemoryError:
            pytest.fail(f"{label}: unbounded allocation from corrupt header")
        except Exception as e:  # noqa: BLE001 — the assertion target
            pytest.fail(
                f"{label}: unclassified {type(e).__name__}: {e} "
                f"(decode_status would still route it, but the codec "
                f"contract is ValueError/NotImplementedError)"
            )
        else:
            # mutation happened to keep the stream decodable (e.g. flip
            # inside pixel data of an uncompressed strip) — sane shape
            assert arr.shape == (_H, _W) and arr.dtype == np.uint16
            survived += 1
    # sanity: SOME mutants must fail, else the harness isn't mutating
    assert survived < 120


def test_fuzz_truncation_ladder():
    """Every prefix-truncation length of one payload per container family
    must classify (truncation is THE dominant real-world corruption)."""
    px = _pixels(11)
    for fmt, payload in [
        ("tiff", codec.encode_tiff_u16(px, compression="lzw")),
        ("tiff", codec.encode_tiff_u16(px, compression="packbits")),
        ("png", codec.encode_png_u16(px)),
        ("jpeg", jpeg.encode_jpeg_gray((px >> 8).astype(np.uint8))),
    ]:
        step = max(1, len(payload) // 97)  # ~97 lengths per payload
        for cut in range(1, len(payload), step):
            try:
                arr = _decode_bounded(payload[:cut], fmt)
                assert arr.shape == (_H, _W)
            except (ValueError, NotImplementedError):
                pass
            except _Timeout:
                pytest.fail(f"{fmt}: hang at truncation {cut}")


def test_fuzz_float_predictor3_classifies():
    """The float-DEM container (SampleFormat 3 + TechNote-3 predictor,
    r7) isn't reachable through codec.decode, so fuzz decode_geotiff
    directly: 120 seeded mutants per compression must yield a float32
    grid or classify as ValueError/NotImplementedError within the time
    bound — same contract as the u16 surface."""
    rng0 = np.random.default_rng(31)
    grid = rng0.normal(500.0, 90.0, (64, 64)).astype(np.float32)
    for comp in ("deflate", "lzw"):
        payload = codec.encode_tiff_f32(
            grid, compression=comp, predictor=3, rows_per_strip=16
        )
        import struct as _struct

        rng = np.random.default_rng(zlib.crc32(f"f32-{comp}".encode()))
        survived = 0
        # decode_geotiff is the raw spec parser: the decode() wrapper
        # normalizes these kinds to ValueError, so they're classified
        benign = (ValueError, NotImplementedError, KeyError, IndexError,
                  EOFError, OverflowError, _struct.error, zlib.error)
        for mutant in _mutations(payload, rng, 120):
            old = signal.signal(
                signal.SIGALRM,
                lambda s, f: (_ for _ in ()).throw(_Timeout("hang")),
            )
            signal.alarm(DECODE_TIMEOUT_S)
            try:
                arr, _meta = codec.decode_geotiff(mutant)
            except benign:
                continue
            except _Timeout:
                pytest.fail(f"f32-{comp}: decode hung on a mutant")
            except MemoryError:
                pytest.fail(f"f32-{comp}: unbounded allocation")
            except Exception as e:  # noqa: BLE001
                pytest.fail(
                    f"f32-{comp}: unclassified {type(e).__name__}: {e}"
                )
            finally:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old)
            assert arr.dtype in (np.float32, np.uint16)
            survived += 1
        assert survived < 120


def test_fuzz_flac_classifies():
    """The r7 stdlib FLAC decoder gets the image-container treatment:
    200 seeded mutants each of a mono fixed-predictor stream and a
    mid/side stereo stream must decode to sane samples or classify
    (ValueError/NotImplementedError) within the time bound. CRC-8/16
    verification means virtually every body flip classifies instead of
    desyncing silently."""
    from tiff_enrichment_pipeline_spark.raster.flac import (
        decode_flac,
        encode_flac_s16,
    )

    sr = 8000
    t = np.arange(3000)
    sine = (9000 * np.sin(2 * np.pi * 330 * t / sr)).astype(np.int16)
    stereo = np.stack([sine, (sine // 3)], axis=1)
    for label, payload in [
        ("flac-mono", encode_flac_s16(sine, sr, block_size=1024)),
        ("flac-ms", encode_flac_s16(stereo, sr, block_size=777,
                                    mid_side=True)),
    ]:
        rng = np.random.default_rng(zlib.crc32(label.encode()))
        survived = 0
        for mutant in _mutations(payload, rng, 200):
            old = signal.signal(
                signal.SIGALRM,
                lambda s, f: (_ for _ in ()).throw(_Timeout("hang")),
            )
            signal.alarm(DECODE_TIMEOUT_S)
            try:
                arr, rate, bps = decode_flac(mutant)
            except (ValueError, NotImplementedError):
                continue
            except _Timeout:
                pytest.fail(f"{label}: FLAC decode hung on a mutant")
            except MemoryError:
                pytest.fail(f"{label}: unbounded allocation")
            except Exception as e:  # noqa: BLE001
                pytest.fail(
                    f"{label}: unclassified {type(e).__name__}: {e}"
                )
            finally:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old)
            assert arr.ndim == 2 and 1 <= rate <= 655350 and bps <= 32
            survived += 1
        assert survived < 200


def test_fuzz_wav_classifies():
    """The RIFF/WAVE parser (r7, raster/multimodal._decode_wav) gets the
    same treatment as the image containers: 200 seeded mutants of a
    valid mono + a stereo PCM-16 stream must return (sane mono array,
    plausible rate) or classify as ValueError/NotImplementedError within
    the time bound — no hang, no corrupt-chunk-size allocation (every
    chunk size is bounded against the buffer before any read)."""
    from tiff_enrichment_pipeline_spark.raster.multimodal import (
        _decode_wav,
        encode_wav_s16,
    )

    sr = 8000
    t = np.arange(sr // 2)
    sine = (9000 * np.sin(2 * np.pi * 330 * t / sr)).astype("<i2")
    stereo = np.empty(2 * len(sine), dtype="<i2")
    stereo[0::2], stereo[1::2] = sine, sine // 2
    for label, payload in [
        ("wav-mono", encode_wav_s16(sine, sr)),
        ("wav-stereo", encode_wav_s16(stereo, sr, n_ch=2)),
    ]:
        rng = np.random.default_rng(zlib.crc32(label.encode()))
        survived = 0
        for mutant in _mutations(payload, rng, 200):
            old = signal.signal(
                signal.SIGALRM,
                lambda s, f: (_ for _ in ()).throw(_Timeout("hang")),
            )
            signal.alarm(DECODE_TIMEOUT_S)
            try:
                mono, rate = _decode_wav(mutant)
            except (ValueError, NotImplementedError):
                continue
            except _Timeout:
                pytest.fail(f"{label}: WAV decode hung on a mutant")
            except MemoryError:
                pytest.fail(f"{label}: unbounded allocation")
            except Exception as e:  # noqa: BLE001
                pytest.fail(
                    f"{label}: unclassified {type(e).__name__}: {e}"
                )
            finally:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old)
            assert mono.ndim == 1 and len(mono) <= len(payload)
            assert 1 <= rate <= 10_000_000
            survived += 1
        assert survived < 200


def test_differential_vs_pillow_if_available():
    """Where Pillow exists, stdlib decodes must agree with it: bit-exact
    for lossless containers, PSNR≥40 dB for JPEG (the lossy bound the
    north_star sets for payload preservation)."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    px = _pixels(13)
    for label, fmt, payload in _encoder_matrix():
        if fmt == "raw-u16":
            continue
        try:
            ours = codec.decode(payload, _W, _H, fmt)
        except NotImplementedError:
            continue
        theirs = np.asarray(PIL.open(io.BytesIO(payload)))
        if theirs.dtype == np.uint8:
            ours_cmp = (ours >> 8).astype(np.uint8) if fmt != "jpeg" else ours
            assert codec.psnr_db(
                ours_cmp.astype(np.uint16), theirs.astype(np.uint16), peak=255
            ) >= 40, label
        else:
            assert np.array_equal(ours, theirs.astype(np.uint16)), label
