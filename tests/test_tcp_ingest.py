"""TCP MPEG-TS ingest: the reference's primary deployment mode
(/root/reference/README.md:41-47 — encoder on a different machine, decoder
opens `tcp://host:port`; VideoDecoder.cc:54 passes the URL straight to
libavformat). The native decoder (native/decoder/mv_decoder.cc) does the
same; this test exercises the network path end-to-end on a loopback socket
with a REAL x264 MPEG-TS stream (no ffmpeg CLI involved)."""
import socket
import threading

import numpy as np
import pytest


@pytest.mark.slow
def test_tcp_mpegts_ingest(tmp_path):
    from movslam_tpu.io.synthetic import SyntheticStream
    from movslam_tpu.io.video import VideoDecoder, encode_gray

    N = 80
    stream = SyntheticStream(n_points=300, seed=13)
    imgs = np.stack([stream.render(k)[0] for k in range(N)])
    path = str(tmp_path / "stream.ts")  # extension picks the MPEG-TS muxer
    encode_gray(path, imgs, fps=30.0, keyint=1000, refs=2, cavlc=True)
    payload = open(path, "rb").read()
    assert len(payload) > 50000
    # MPEG-TS sync bytes every 188 bytes.
    assert payload[0] == 0x47 and payload[188] == 0x47

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        try:
            # Stream in chunks like a live encoder would.
            for off in range(0, len(payload), 32 * 188):
                conn.sendall(payload[off : off + 32 * 188])
        finally:
            conn.close()
            srv.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    dec = VideoDecoder(f"tcp://127.0.0.1:{port}", qlen=12)
    dec.init()
    n_frames = 0
    n_p_with_mvs = 0
    while True:
        smv = dec.next_image(True)
        if smv is None:
            break
        n_frames += 1
        assert smv.im_gray.shape == (480, 640)
        if smv.ft == 1 and smv.n_mvs > 100:
            n_p_with_mvs += 1
    t.join(timeout=10)

    # The lookahead deque may hold back the final frames at EOF-over-socket;
    # the bulk of the stream must arrive with dense MV records.
    assert n_frames >= N - 13, n_frames
    assert n_p_with_mvs >= n_frames - 5, (n_p_with_mvs, n_frames)
