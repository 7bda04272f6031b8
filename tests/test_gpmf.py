"""Native GPMF/MP4 telemetry reader round trip: synthesize a GoPro-style
MP4 (gpmd track with DEVC/STRM KLV payloads + a stub video track), parse it
with the C++ reader, and verify streams, scaling, timing, and the GoPro
axis conventions of core.gpmf.read_gopro_mp4."""

import struct

import numpy as np
import pytest

from openimucameracalibrator_tpu.core import gpmf
from openimucameracalibrator_tpu.utils import mp4_writer, native


def klv(key: bytes, type_c: bytes, ssize: int, repeat: int, data: bytes) -> bytes:
    pad = (-len(data)) % 4
    return struct.pack(">4scBH", key, type_c, ssize, repeat) + data + b"\0" * pad


def klv_nested(key: bytes, inner: bytes) -> bytes:
    assert len(inner) % 4 == 0
    return struct.pack(">4scBH", key, b"\0", 1, len(inner)) + inner


def sensor_stream(key: bytes, values: np.ndarray, scale: int) -> bytes:
    """STRM with int16 sensor data + SCAL (GoPro ACCL/GYRO/CORI layout)."""
    n, c = values.shape
    raw = np.round(values * scale).astype(">i2")
    inner = klv(b"STNM", b"c", 1, 4, b"test")
    inner += klv(b"SCAL", b"s", 2, 1, struct.pack(">h", scale))
    inner += klv(key, b"s", 2 * c, n, raw.tobytes())
    return klv_nested(b"STRM", inner)


def payload(streams: bytes) -> bytes:
    inner = klv(b"DVID", b"L", 4, 1, struct.pack(">L", 1))
    inner += klv(b"DVNM", b"c", 1, 8, b"GoPro   ")
    inner += streams
    return klv_nested(b"DEVC", inner)


def box(type4: bytes, payload_b: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload_b), type4) + payload_b


def full_box(type4: bytes, body: bytes, version=0, flags=0) -> bytes:
    return box(type4, struct.pack(">I", (version << 24) | flags) + body)


def make_track(handler: bytes, fmt: bytes, timescale: int,
               stts: list, sample_sizes: list, chunk_offsets: list) -> bytes:
    hdlr = full_box(b"hdlr", struct.pack(">I4s", 0, handler) + b"\0" * 13)
    mdhd = full_box(b"mdhd", struct.pack(">IIII", 0, 0, timescale, 0)
                    + struct.pack(">HH", 0x55C4, 0))
    stsd = full_box(b"stsd", struct.pack(">I", 1)
                    + struct.pack(">I4s", 16, fmt) + b"\0" * 8)
    stts_b = full_box(b"stts", struct.pack(">I", len(stts))
                      + b"".join(struct.pack(">II", c, d) for c, d in stts))
    stsz = full_box(b"stsz", struct.pack(">II", 0, len(sample_sizes))
                    + b"".join(struct.pack(">I", s) for s in sample_sizes))
    stsc = full_box(b"stsc", struct.pack(">I", 1) + struct.pack(">III", 1, 1, 1))
    stco = full_box(b"stco", struct.pack(">I", len(chunk_offsets))
                    + b"".join(struct.pack(">I", o) for o in chunk_offsets))
    stbl = box(b"stbl", stsd + stts_b + stsz + stsc + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    return box(b"trak", mdia)


@pytest.fixture(scope="module")
def sample_mp4(tmp_path_factory):
    rng = np.random.default_rng(0)
    n_payloads, hz, fps = 3, 200, 60
    accl = rng.normal(0, 2, (n_payloads, hz, 3)) + [0, 0, 9.81]
    gyro = rng.normal(0, 0.5, (n_payloads, hz, 3))
    payloads = [payload(sensor_stream(b"ACCL", accl[k], 418)
                        + sensor_stream(b"GYRO", gyro[k], 939))
                for k in range(n_payloads)]

    ftyp = box(b"ftyp", b"mp41" + struct.pack(">I", 0) + b"mp41")
    # mdat starts right after ftyp; chunk offsets are absolute
    mdat_payload = b"".join(payloads)
    mdat_off = len(ftyp)
    offsets = []
    cur = mdat_off + 8
    for p in payloads:
        offsets.append(cur)
        cur += len(p)
    mdat = box(b"mdat", mdat_payload)

    gp_trak = make_track(b"meta", b"gpmd", 1000,
                         [(n_payloads, 1000)],  # 1 s per payload
                         [len(p) for p in payloads], offsets)
    vid_trak = make_track(b"vide", b"avc1", 60000,
                          [(n_payloads * fps, 1000)],  # 60 fps
                          [1] * (n_payloads * fps), [mdat_off + 8])
    moov = box(b"moov", gp_trak + vid_trak)

    path = tmp_path_factory.mktemp("gpmf") / "sample.mp4"
    path.write_bytes(ftyp + mdat + moov)
    return str(path), accl, gyro


def test_native_library_builds():
    lib = native.load_library("gpmf_reader")
    assert lib is not None


def test_gpmf_streams_and_scaling(sample_mp4):
    path, accl, gyro = sample_mp4
    with gpmf.GpmfFile(path) as f:
        names = f.stream_names()
        assert "ACCL" in names and "GYRO" in names
        t, vals = f.stream("ACCL")
        assert vals.shape == (3 * 200, 3)
        want = np.round(accl.reshape(-1, 3) * 418) / 418
        np.testing.assert_allclose(vals, want, atol=1e-12)
        # payload k spans [k, k+1) s, 200 samples uniform
        np.testing.assert_allclose(t[:3], [0.0, 1 / 200, 2 / 200], atol=1e-12)
        np.testing.assert_allclose(t[200], 1.0, atol=1e-12)


def test_gpmf_frame_times(sample_mp4):
    path, _, _ = sample_mp4
    with gpmf.GpmfFile(path) as f:
        ft = f.frame_times()
        assert len(ft) == 180
        np.testing.assert_allclose(np.diff(ft), 1 / 60, atol=1e-9)


def test_read_gopro_mp4_conventions(sample_mp4):
    path, accl, gyro = sample_mp4
    tel = gpmf.read_gopro_mp4(path)
    assert tel.imu.times.shape == (600,)
    # channel remap [1, 2, 0]
    want = (np.round(accl.reshape(-1, 3) * 418) / 418)[:, [1, 2, 0]]
    np.testing.assert_allclose(tel.imu.accel, want, atol=1e-12)
    assert tel.img_times is not None and len(tel.img_times) == 180
    assert abs(tel.imu.rate_hz - 200.0) < 1.0


def test_read_gopro_mp4_missing_streams(tmp_path):
    # an mp4 with no gpmd track -> clear error
    ftyp = box(b"ftyp", b"mp41" + struct.pack(">I", 0) + b"mp41")
    vid = make_track(b"vide", b"avc1", 60000, [(10, 1000)], [1] * 10, [0])
    path = tmp_path / "plain.mp4"
    path.write_bytes(ftyp + box(b"moov", vid))
    with pytest.raises(ValueError):
        gpmf.read_gopro_mp4(str(path))


def test_gpmf_open_missing_file():
    with pytest.raises(FileNotFoundError):
        gpmf.GpmfFile("/nonexistent/file.mp4")


def test_read_gopro_mp4_gps(tmp_path):
    """GPS5 (+GPSP) streams populate CameraTelemetry.gps (reference
    python/telemetry_converter.py:346-385)."""
    from openimucameracalibrator_tpu.utils import mp4_writer

    hz, gps_hz, dur = 200, 10, 2
    t = np.arange(hz * dur) / hz
    accel = np.tile([0.0, 0.0, 9.81], (len(t), 1))
    gyro = np.zeros((len(t), 3))
    tg = np.arange(gps_hz * dur) / gps_hz
    llh = np.stack([48.1 + 1e-5 * tg, 11.5 + 2e-5 * tg, 520 + 0.1 * tg], -1)
    gps5 = np.concatenate([llh, np.full((len(tg), 1), 1.5),
                           np.full((len(tg), 1), 1.7)], -1)
    gpsp = np.full((len(tg), 1), 180.0)  # DOP*100 pre-scale convention

    payloads = []
    for k in range(dur):
        sel = (t >= k) & (t < k + 1)
        selg = (tg >= k) & (tg < k + 1)
        payloads.append(mp4_writer.gpmf_payload([
            ("ACCL", "Accelerometer", accel[sel][:, [2, 0, 1]]),
            ("GYRO", "Gyroscope", gyro[sel][:, [2, 0, 1]]),
            ("GPS5", "GPS", gps5[selg]),
            ("GPSP", "GPS precision", gpsp[selg]),
        ]))
    frame = mp4_writer.encode_jpeg(np.zeros((16, 16), np.uint8))
    path = str(tmp_path / "gps.mp4")
    mp4_writer.write_mp4(path, [frame] * (30 * dur), 16, 16, 30.0,
                         payloads, payload_duration_s=1.0)

    tel = gpmf.read_gopro_mp4(path)
    assert tel.gps is not None
    assert tel.gps.llh.shape == (len(tg), 3)
    np.testing.assert_allclose(tel.gps.llh, llh, atol=1e-4)
    np.testing.assert_allclose(tel.gps.vel3d, 1.7, atol=1e-5)
    assert tel.gps.precision is not None
    np.testing.assert_allclose(tel.gps.precision, 180.0, atol=1e-3)
    np.testing.assert_allclose(tel.gps.times[1] - tel.gps.times[0],
                               1.0 / gps_hz, atol=1e-9)


def test_spec_transcribed_gopro9_payloads(tmp_path):
    """Parse GPMF payloads the repo's own muxer did NOT write: byte
    layouts hand-transcribed from the published GPMF spec in GoPro9 style
    — STMP (us device clock, 'J'), TSMP (cumulative count, 'L'), ORIN/
    ORIO, per-channel VECTOR SCAL, int16 sensor data (VERDICT r2 item 8).
    Verifies: vector SCAL application, STMP-anchored payload timing (a
    payload whose STMP drifts from the MP4 clock lands at the STMP time),
    and TSMP dropped-sample accounting."""
    import struct

    def klv(key, tc, ssize, repeat, data):
        pad = (-len(data)) % 4
        return (key + tc + bytes([ssize]) + struct.pack(">H", repeat)
                + data + b"\x00" * pad)

    def nest(key, children):
        inner = b"".join(children)
        return klv(key, b"\x00", 1, len(inner), inner)

    hz = 100
    n = hz  # samples per 1 s payload
    raw = np.zeros((2 * n, 3), np.int16)
    raw[:, 0] = np.arange(2 * n) % 400        # "z" counts
    raw[:, 1] = 418                            # "x"
    raw[:, 2] = -209                           # "y"
    scal = np.asarray([418, 209, 100], np.int32)  # per-channel divisors

    def accl_strm(k, stmp_us, tsmp):
        sel = raw[k * n:(k + 1) * n]
        return nest(b"STRM", [
            klv(b"STMP", b"J", 8, 1, struct.pack(">Q", stmp_us)),
            klv(b"TSMP", b"L", 4, 1, struct.pack(">L", tsmp)),
            klv(b"STNM", b"c", 1, 34, b"Accelerometer (up/down, right/left)"[:34]),
            klv(b"ORIN", b"c", 1, 3, b"ZXY"),
            klv(b"ORIO", b"c", 1, 3, b"YxZ"),
            klv(b"SIUN", b"c", 1, 5, b"m/s\xb2\x00"),
            klv(b"SCAL", b"l", 4, 3, struct.pack(">3l", *scal)),
            klv(b"ACCL", b"s", 6, n, sel.astype(">i2").tobytes()),
        ])

    # Payload 2's STMP drifts +20 ms past the MP4 clock; TSMP claims 10
    # more samples than delivered (a camera-side drop).
    payloads = [
        nest(b"DEVC", [klv(b"DVID", b"L", 4, 1, struct.pack(">L", 1)),
                       klv(b"DVNM", b"c", 1, 6, b"Hero9 "),
                       accl_strm(0, 500_000, n)]),
        nest(b"DEVC", [klv(b"DVID", b"L", 4, 1, struct.pack(">L", 1)),
                       klv(b"DVNM", b"c", 1, 6, b"Hero9 "),
                       accl_strm(1, 1_520_000, 2 * n + 10)]),
    ]
    frame = mp4_writer.encode_jpeg(np.zeros((16, 16), np.uint8))
    path = str(tmp_path / "spec.mp4")
    mp4_writer.write_mp4(path, [frame] * 60, 16, 16, 30.0, payloads,
                         payload_duration_s=1.0)

    with gpmf.GpmfFile(path) as f:
        assert "ACCL" in f.stream_names()
        t, v = f.stream("ACCL")
        assert v.shape == (2 * n, 3)
        # Vector SCAL: per-channel divisors applied.
        np.testing.assert_allclose(v[:, 1], 418 / 209.0, atol=1e-12)
        np.testing.assert_allclose(v[:, 2], -209 / 100.0, atol=1e-12)
        np.testing.assert_allclose(v[:, 0], (np.arange(2 * n) % 400) / 418.0,
                                   atol=1e-12)
        # STMP anchoring: payload 1 starts at MP4 t=0; payload 2 at
        # 0 + (1.52s - 0.5s) = 1.02 s, NOT the MP4 sample time 1.00 s.
        assert abs(t[0] - 0.0) < 1e-9
        assert abs(t[n] - 1.02) < 1e-9
        # TSMP accounting: 10 samples lost between payloads.
        assert f.stream_dropped("ACCL") == 10
        assert f.stream_dropped("GYRO") == 0


def test_tick_based_timing(tmp_path):
    """Older-camera TICK (ms, 'L') timing path: payload start follows the
    tick clock anchored at the first payload (gpmf-parser behavior)."""
    import struct

    def klv(key, tc, ssize, repeat, data):
        pad = (-len(data)) % 4
        return (key + tc + bytes([ssize]) + struct.pack(">H", repeat)
                + data + b"\x00" * pad)

    def nest(key, children):
        inner = b"".join(children)
        return klv(key, b"\x00", 1, len(inner), inner)

    n = 50
    def strm(tick_ms):
        data = np.full((n, 3), 1000, np.int16)
        return nest(b"STRM", [
            klv(b"TICK", b"L", 4, 1, struct.pack(">L", tick_ms)),
            klv(b"SCAL", b"s", 2, 1, struct.pack(">h", 100)),
            klv(b"GYRO", b"s", 6, n, data.astype(">i2").tobytes()),
        ])

    payloads = [nest(b"DEVC", [strm(7000)]), nest(b"DEVC", [strm(8050)])]
    frame = mp4_writer.encode_jpeg(np.zeros((16, 16), np.uint8))
    path = str(tmp_path / "tick.mp4")
    mp4_writer.write_mp4(path, [frame] * 60, 16, 16, 30.0, payloads,
                         payload_duration_s=1.0)
    with gpmf.GpmfFile(path) as f:
        t, v = f.stream("GYRO")
        np.testing.assert_allclose(v, 10.0, atol=1e-12)
        assert abs(t[0] - 0.0) < 1e-9
        assert abs(t[n] - 1.05) < 1e-9  # 8050 ms - 7000 ms after anchor


def test_anchored_stream_never_mixes_clocks(tmp_path):
    """A payload missing STMP/TICK inside an otherwise anchored stream
    must continue the device-clock axis (previous payload end), not fall
    back to raw MP4 stts time — mixing the two clocks makes the stream's
    time axis non-monotonic once they drift (advisor r3 finding)."""
    import struct

    def klv(key, tc, ssize, repeat, data):
        pad = (-len(data)) % 4
        return (key + tc + bytes([ssize]) + struct.pack(">H", repeat)
                + data + b"\x00" * pad)

    def nest(key, children):
        inner = b"".join(children)
        return klv(key, b"\x00", 1, len(inner), inner)

    n = 50

    def strm(tick_ms):
        data = np.full((n, 3), 1000, np.int16)
        children = []
        if tick_ms is not None:
            children.append(klv(b"TICK", b"L", 4, 1,
                                struct.pack(">L", tick_ms)))
        children += [
            klv(b"SCAL", b"s", 2, 1, struct.pack(">h", 100)),
            klv(b"GYRO", b"s", 6, n, data.astype(">i2").tobytes()),
        ]
        return nest(b"STRM", children)

    # Device clock runs 200 ms ahead of MP4 by payload 2; payload 3 has
    # NO TICK. Falling back to MP4 time (2.0 s) would step BACKWARD from
    # payload 2's anchored end (1.2 + 1.0 = 2.2 s).
    payloads = [nest(b"DEVC", [strm(7000)]),
                nest(b"DEVC", [strm(8200)]),
                nest(b"DEVC", [strm(None)]),
                nest(b"DEVC", [strm(10200)])]
    frame = mp4_writer.encode_jpeg(np.zeros((16, 16), np.uint8))
    path = str(tmp_path / "mixed.mp4")
    mp4_writer.write_mp4(path, [frame] * 120, 16, 16, 30.0, payloads,
                         payload_duration_s=1.0)
    with gpmf.GpmfFile(path) as f:
        t, _ = f.stream("GYRO")
        assert abs(t[0] - 0.0) < 1e-9
        assert abs(t[n] - 1.2) < 1e-9       # anchored: 8200-7000 ms
        assert abs(t[2 * n] - 2.2) < 1e-9   # continued, NOT mp4 2.0 s
        assert abs(t[3 * n] - 3.2) < 1e-9   # back on the device clock
        assert np.all(np.diff(t) > 0), "time axis must stay monotonic"
