# coding: utf-8
"""Gentle web-alignment tooling: JSON -> HTK label conversion and the HTTP
client, driven against a local fake Gentle server."""

import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import gentle_web_align as gwa  # noqa: E402


FAKE_ALIGNMENT = {
    "words": [
        {"case": "success", "start": 0.5, "end": 0.9,
         "phones": [{"phone": "hh_B", "duration": 0.2},
                    {"phone": "ay_E", "duration": 0.2}]},
        {"case": "not-found-in-audio"},
        {"case": "success", "start": 1.0, "end": 1.3,
         "phones": [{"phone": "y_B", "duration": 0.3}]},
        {"case": "success", "start": 1.4, "end": 1.6,
         "phones": [{"phone": "ow_S", "duration": 0.2}]},
    ]
}


def test_alignment_to_labels():
    ratio, labels = gwa.alignment_to_labels(FAKE_ALIGNMENT)
    assert abs(ratio - 0.25) < 1e-9
    assert labels[0] == (0.0, 0.5, "silB")
    assert labels[1] == (0.5, 0.7, "hh")
    assert labels[2][2] == "ay"
    assert labels[-1][2] == "silE"
    # silE closes at the last word's end
    assert labels[-1][0] == pytest.approx(1.6)


def test_to_htk_label_lines():
    txt = gwa.to_htk_label_lines([(0.0, 0.5, "silB"), (0.5, 0.7, "hh")])
    lines = txt.strip().split("\n")
    assert lines[0] == "0 5000000 silB"
    assert lines[1] == "5000000 7000000 hh"


def test_labels_roundtrip_through_preprocessor_parser(tmp_path):
    from deepvoice3_pytorch_tpu.datasets import common
    _, labels = gwa.alignment_to_labels(FAKE_ALIGNMENT)
    labels = [(s, e, "pau" if p in ("silB", "silE") else p)
              for s, e, p in labels]
    p = tmp_path / "utt.lab"
    p.write_text(gwa.to_htk_label_lines(labels))
    parsed = common.load_hts_labels(str(p))
    assert parsed[0][2] == "pau" and parsed[-1][2] == "pau"
    s, e = common.lab_trim_bounds_pau(parsed)
    assert s == 5000000 and e == 16000000


class _FakeGentle(BaseHTTPRequestHandler):
    def do_POST(self):
        length = int(self.headers["Content-Length"])
        body = self.rfile.read(length)
        assert b"audio" in body and b"transcript" in body
        payload = json.dumps(FAKE_ALIGNMENT).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


@pytest.fixture()
def fake_server():
    srv = HTTPServer(("127.0.0.1", 0), _FakeGentle)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1]
    srv.shutdown()


def test_cli_end_to_end(tmp_path, fake_server, capsys):
    from scipy.io import wavfile
    wav = (np.random.RandomState(0).rand(4000) * 1000).astype(np.int16)
    wavfile.write(tmp_path / "utt1.wav", 16000, wav)
    (tmp_path / "utt1.txt").write_text("hi you")

    rc = gwa.main(["-w", str(tmp_path / "*.wav"),
                   "-t", str(tmp_path / "*.txt"),
                   "--server_addr", "127.0.0.1",
                   "--port", str(fake_server)])
    assert rc == 0
    lab = (tmp_path / "utt1.lab").read_text().strip().split("\n")
    assert lab[0].endswith("silB") and lab[-1].endswith("silE")

    # skip-already-done leaves the file alone
    rc = gwa.main(["-w", str(tmp_path / "*.wav"),
                   "-t", str(tmp_path / "*.txt"),
                   "--server_addr", "127.0.0.1",
                   "--port", str(fake_server), "--skip-already-done"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "1 skipped" in out


def test_cli_unalign_filter(tmp_path, fake_server):
    from scipy.io import wavfile
    wav = np.zeros(4000, np.int16)
    wavfile.write(tmp_path / "u.wav", 16000, wav)
    (tmp_path / "u.txt").write_text("hi you")
    rc = gwa.main(["-w", str(tmp_path / "*.wav"),
                   "-t", str(tmp_path / "*.txt"),
                   "--server_addr", "127.0.0.1",
                   "--port", str(fake_server),
                   "--max_unalign", "0.1"])
    assert rc == 0
    assert not (tmp_path / "u.lab").exists()


def test_prepare_vctk_labels_layout(tmp_path, fake_server):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "vctk_preprocess"))
    import prepare_vctk_labels as pvl
    from scipy.io import wavfile

    for spk in ("p225", "p226"):
        os.makedirs(tmp_path / "wav48" / spk)
        os.makedirs(tmp_path / "txt" / spk)
        wav = (np.random.RandomState(0).rand(4000) * 1000).astype(np.int16)
        wavfile.write(tmp_path / "wav48" / spk / f"{spk}_001.wav", 16000, wav)
        (tmp_path / "txt" / spk / f"{spk}_001.txt").write_text("hi you")

    rc = pvl.main([str(tmp_path), str(tmp_path / "lab"),
                   "--server_addr", "127.0.0.1",
                   "--port", str(fake_server), "--speakers", "225,226"])
    assert rc == 0
    lab = (tmp_path / "lab" / "p225" / "p225_001.lab").read_text()
    assert "pau" in lab and "silB" not in lab


# ---------------------------------------------------------------------------
# pluggable aligner driver (vctk_preprocess/align.py) — the designed
# equivalent of the reference merlin/HTK path (DESIGN.md §7.1)
# ---------------------------------------------------------------------------

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "vctk_preprocess"))
import align as align_mod  # noqa: E402


def _mk_utts(tmp_path, n=2):
    wav_dir = tmp_path / "wav"
    txt_dir = tmp_path / "txt"
    wav_dir.mkdir()
    txt_dir.mkdir()
    for i in range(n):
        (wav_dir / ("utt%d.wav" % i)).write_bytes(b"RIFFfake")
        (txt_dir / ("utt%d.txt" % i)).write_text("hello world %d" % i)
    return str(wav_dir), str(txt_dir)


def test_align_cmd_backend_produces_parseable_labs(tmp_path):
    """--backend=cmd with an external 'aligner' (here: a python one-liner)
    yields .lab files that validate AND parse through the production
    load_hts_labels + pau-trim path — the end-to-end contract a merlin/HTK
    user relies on."""
    from deepvoice3_pytorch_tpu.datasets import common as ds_common

    wav_dir, txt_dir = _mk_utts(tmp_path)
    out_dir = str(tmp_path / "lab")
    script = tmp_path / "fake_aligner.py"
    script.write_text(
        "import sys\n"
        "open(sys.argv[1], 'w').write("
        "'0 1000000 pau\\n1000000 5000000 ah\\n5000000 6000000 pau\\n')\n")
    align_mod.run_cmd_backend(
        "%s %s {lab}" % (sys.executable, script), wav_dir, txt_dir, out_dir)

    labs = sorted(os.listdir(out_dir))
    assert labs == ["utt0.lab", "utt1.lab"]
    labels = ds_common.load_hts_labels(os.path.join(out_dir, "utt0.lab"))
    start, end = ds_common.lab_trim_bounds_pau(labels)
    assert 0 <= start < end


def test_align_cmd_backend_rejects_bad_output(tmp_path):
    """A misbehaving external aligner (non-contiguous segments) must be
    rejected by the validation gate, not silently accepted."""
    import pytest

    wav_dir, txt_dir = _mk_utts(tmp_path, n=1)
    out_dir = str(tmp_path / "lab")
    script = tmp_path / "bad_aligner.py"
    script.write_text(
        "import sys\n"
        "open(sys.argv[1], 'w').write('0 10 pau\\n50 60 ah\\n')\n")
    with pytest.raises(ValueError, match="contiguous"):
        align_mod.run_cmd_backend(
            "%s %s {lab}" % (sys.executable, script),
            wav_dir, txt_dir, out_dir)
