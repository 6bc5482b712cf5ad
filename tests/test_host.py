"""Host subsystem tests: protocol wire parity, stream parsing, monitor
stats, and the end-to-end camera-emulation streamer."""

import io

import numpy as np

from yoloface_tpu.host import protocol
from yoloface_tpu.host.monitor import MonitorState, run_monitor
from yoloface_tpu.host.streamer import CameraStreamer, directory_frames


def test_encode_matches_firmware_format():
    """Byte-for-byte format of main.c:44,51 + yoloface.c:148."""
    boxes = np.array([[10.0, 12.0, 30.0, 40.0]])
    text = protocol.encode_frame(7, boxes, np.array([0.93]),
                                 np.array([True]))
    assert text == (
        "=== Frame 7 ===\r\n"
        + "-" * 40 + "\r\n"
        + "[Face 1] BBox: [20, 24, 60, 80], Conf: 0.93\r\n"
        + "-" * 40 + "\r\n"
        + "[INFO] Total faces detected: 1\r\n")


def test_roundtrip_encode_parse():
    boxes = np.array([[5.0, 6.0, 20.0, 25.0], [30.0, 30.0, 50.0, 52.0],
                      [0.0, 0.0, 0.0, 0.0]])
    valid = np.array([True, True, False])
    text = protocol.encode_frame(3, boxes, np.array([0.88, 0.71, 0.0]),
                                 valid)
    frame = protocol.parse_frame(text.split("\r\n"))
    assert frame.number == 3
    assert frame.total == 2
    assert len(frame.faces) == 2
    assert frame.faces[0].x1 == 10 and frame.faces[0].confidence == 0.88
    assert frame.faces[1].width == 40


def test_stream_parser_partial_chunks():
    """Parser must tolerate arbitrary chunk boundaries like the serial RX
    thread (main.py:281-311)."""
    boxes = np.array([[5.0, 6.0, 20.0, 25.0]])
    text = "".join(protocol.encode_frame(i + 1, boxes, np.array([0.9]),
                                         np.array([True]))
                   for i in range(3))
    parser = protocol.StreamParser()
    frames = []
    for i in range(0, len(text), 17):  # awkward 17-byte chunks
        frames.extend(parser.feed(text[i:i + 17]))
    assert [f.number for f in frames] == [1, 2, 3]
    assert all(f.total == 1 for f in frames)


def test_monitor_state_and_render():
    state = MonitorState(history_len=5)
    boxes = np.array([[5.0, 6.0, 20.0, 25.0]])
    for i in range(8):
        text = protocol.encode_frame(i + 1, boxes, np.array([0.9]),
                                     np.array([True]))
        state.update(protocol.parse_frame(text.split("\r\n")))
    assert state.frames == 8
    assert state.total_faces == 8
    assert len(state.history) == 5
    out = state.render()
    assert "Frame 8: 1 face(s)" in out
    assert "#1" in out
    canvas = state.ascii_canvas()
    assert "#" in canvas
    assert state.summary()["avg_faces"] == 1.0


def test_run_monitor_from_text():
    boxes = np.array([[5.0, 6.0, 20.0, 25.0]])
    text = "".join(protocol.encode_frame(i + 1, boxes, np.array([0.9]),
                                         np.array([True]))
                   for i in range(4))
    out = io.StringIO()
    state = run_monitor([text], render_every=2, out=out)
    assert state.frames == 4
    assert "Frame 4" in out.getvalue()


def test_run_monitor_save_png(tmp_path):
    """--save-png writes a rendered dashboard image (box canvas + rolling
    history chart — the reference GUI's live visual, main.py:448-552) at
    every render point, valid and decodable."""
    import cv2

    boxes = np.array([[5.0, 6.0, 20.0, 25.0], [40.0, 50.0, 90.0, 100.0]])
    text = "".join(protocol.encode_frame(i + 1, boxes,
                                         np.array([0.9, 0.75]),
                                         np.array([True, True]))
                   for i in range(4))
    out = io.StringIO()
    png_dir = tmp_path / "dash"
    state = run_monitor([text], render_every=2, out=out,
                        save_png=str(png_dir))
    assert state.frames == 4
    pngs = sorted(png_dir.glob("frame_*.png"))
    assert [p.name for p in pngs] == ["frame_00002.png", "frame_00004.png"]
    img = cv2.imread(str(pngs[-1]))
    assert img is not None and img.shape[0] > 100 and img.shape[1] > 100
    # the canvas is not blank: the box edges leave non-background pixels
    assert img.std() > 1.0


def test_monitor_socket_source():
    """Byte-stream transport parity: protocol text pushed over a TCP socket
    (the serial-port role, 上位机/IAP/main.py:228-311) reaches the monitor
    through socket_stream and parses into the same frames — including a
    frame split across TCP segments (the GUI's partial-line buffering,
    main.py:379-399)."""
    import socket
    import threading

    from yoloface_tpu.host.monitor import socket_stream

    boxes = np.array([[5.0, 6.0, 20.0, 25.0]])
    text = "".join(protocol.encode_frame(i + 1, boxes, np.array([0.9]),
                                         np.array([True]))
                   for i in range(3))
    payload = text.encode()

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def produce():
        conn, _ = srv.accept()
        mid = len(payload) // 2          # split mid-frame
        conn.sendall(payload[:mid])
        conn.sendall(payload[mid:])
        conn.close()
        srv.close()

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    out = io.StringIO()
    state = run_monitor(socket_stream("127.0.0.1", port, timeout=10.0),
                        render_every=1, out=out)
    t.join(5.0)
    assert state.frames == 3
    assert state.total_faces == 3
    assert "Frame 3" in out.getvalue()


def test_camera_streamer_end_to_end(int8_graph):
    """Directory frames -> double-buffered streamer -> pipeline ->
    protocol -> parsed frames; faces must be found on the real dataset."""
    from yoloface_tpu.pipeline.e2e import FacePipeline
    from yoloface_tpu.runtime.engine import Int8Engine
    pipe = FacePipeline(Int8Engine(int8_graph))
    src = directory_frames("/root/reference/yoloface/small_dataset", 8)
    texts = []
    stats = CameraStreamer(pipe, src).run(2, on_frame=texts.append)
    assert stats["frames"] == 16
    assert stats["faces"] >= 12  # most dataset images contain one face
    parser = protocol.StreamParser()
    frames = [f for t in texts for f in parser.feed(t)]
    assert len(frames) == 16
    assert sum(f.total for f in frames) == stats["faces"]


def test_gui_geometry_pure_functions():
    """host/gui.py widget-free core: chart polyline scaling and the
    112->canvas box mapping (the GUI twin of main.py:448-472/474-552
    must not drift from the display-space convention)."""
    from yoloface_tpu.host.gui import DISPLAY, box_px, chart_points

    assert DISPLAY == 112
    # box scaling: full display box -> full canvas box
    f = protocol.Face(1, 0, 0, 112, 112, 0.9)
    assert box_px(f, 336) == (0, 0, 336, 336)
    f = protocol.Face(2, 28, 56, 84, 112, 0.5)
    assert box_px(f, 336) == (84, 168, 252, 336)

    # chart: empty -> no points; monotone history maps into the padded
    # box with y flipped (tk origin top-left: bigger value = smaller y)
    assert chart_points([], 100, 50) == []
    pts = chart_points([0, 1, 2, 4], 100, 50, pad=8)
    assert len(pts) == 4
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    assert xs == sorted(xs) and xs[0] == 8 and xs[-1] == 92
    assert ys[0] == 42 and ys[-1] == 8          # 0 -> bottom, max -> top
    assert all(ys[i] > ys[i + 1] for i in range(3))


def test_gui_headless_fallback(capsys):
    """--gui on a display-less host must fall back, not crash."""
    import os
    from yoloface_tpu.host.gui import run_gui
    old = os.environ.pop("DISPLAY", None)
    try:
        assert run_gui(config_path="/tmp/_gui_cfg_test.json") is False
        assert "falling back" in capsys.readouterr().out
    finally:
        if old is not None:
            os.environ["DISPLAY"] = old
