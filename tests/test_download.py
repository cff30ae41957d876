"""Download manager tests (reference ``gsv_tts/Download.py:42-181``) — every
branch exercised offline: a local HTTP server stands in for HF/ModelScope,
and a fake-response monkeypatch drives the size-integrity branch."""
import io
import os
import threading
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import pytest

from gsv_tts_tpu import download as dl


# ---------------------------------------------------------------- fixtures

class _AssetHandler(BaseHTTPRequestHandler):
    """Serves ``server.files`` dict; optional 405-on-HEAD and 404 modes."""

    def log_message(self, *a):  # keep pytest output clean
        pass

    def _body(self):
        return self.server.files.get(self.path.split("?")[0].lstrip("/"))

    def do_HEAD(self):
        if getattr(self.server, "head_405", False):
            self.send_response(405)
            self.end_headers()
            return
        body = self._body()
        self.send_response(200 if body is not None else 404)
        if body is not None:
            self.send_header("Content-Length", str(len(body)))
        self.end_headers()

    def do_GET(self):
        body = self._body()
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def asset_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _AssetHandler)
    srv.files = {}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv
    finally:
        srv.shutdown()
        t.join(timeout=5)


def _url(srv, template=""):
    """Base URL of the local asset server; pass ``"%s"`` for the
    fill-in-the-filename templates the download module expects."""
    return f"http://127.0.0.1:{srv.server_address[1]}/" + template


def _zip_bytes(entries):
    """entries: {archive_path: bytes} → zip file bytes."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, data in entries.items():
            z.writestr(name, data)
    return buf.getvalue()


@pytest.fixture(autouse=True)
def reset_base_url():
    old = dl._base_url
    dl._base_url = None
    yield
    dl._base_url = old


# ------------------------------------------------------------ download_file

def test_download_file_happy_path(asset_server, tmp_path):
    asset_server.files["blob.bin"] = b"x" * 200_000  # multiple 64K chunks
    dest = tmp_path / "blob.bin"
    assert dl.download_file(_url(asset_server) + "blob.bin", dest) is True
    assert dest.read_bytes() == b"x" * 200_000


def test_download_file_404_error_page_not_saved(asset_server, tmp_path):
    """An HTTP error page must raise, never be written out as the asset."""
    import requests

    dest = tmp_path / "missing.zip"
    with pytest.raises(requests.HTTPError):
        dl.download_file(_url(asset_server) + "missing.zip", dest)
    assert not dest.exists()


def test_download_file_size_integrity_rejection(tmp_path, monkeypatch):
    """A short read (fewer bytes than content-length) returns False."""
    class _FakeResponse:
        headers = {"content-length": "1000"}

        def raise_for_status(self):
            pass

        def iter_content(self, n):
            yield b"y" * 300  # 700 bytes short

    monkeypatch.setattr(dl, "DOWNLOAD_TIMEOUT_S", 1.0)
    import requests

    monkeypatch.setattr(requests, "get", lambda *a, **k: _FakeResponse())
    assert dl.download_file("http://unused/x.zip", tmp_path / "x.zip") is False


# ------------------------------------------------------------ check_latency

def test_check_latency_reachable(asset_server):
    asset_server.files["probe"] = b"ok"
    ok, lat = dl.check_latency(_url(asset_server) + "probe")
    assert ok is True and 0 <= lat < 10_000


def test_check_latency_head_405_falls_back_to_get(asset_server):
    asset_server.files["probe"] = b"ok"
    asset_server.head_405 = True
    ok, _ = dl.check_latency(_url(asset_server) + "probe")
    assert ok is True


def test_check_latency_unreachable():
    ok, lat = dl.check_latency("http://127.0.0.1:9/never", timeout=0.5)
    assert ok is False and lat == float("inf")


# ------------------------------------------------------------- get_base_url

@pytest.mark.parametrize("hf,ms,expect", [
    ((True, 50.0), (False, float("inf")), dl.HUGGINGFACE_BASE_URL),
    ((False, float("inf")), (True, 50.0), dl.MODELSCOPE_BASE_URL),
    ((False, float("inf")), (False, float("inf")), dl.HUGGINGFACE_BASE_URL),
    ((True, 80.0), (True, 20.0), dl.MODELSCOPE_BASE_URL),
    ((True, 20.0), (True, 80.0), dl.HUGGINGFACE_BASE_URL),
])
def test_get_base_url_latency_race(monkeypatch, hf, ms, expect):
    def fake_latency(url, timeout=3.0):
        return hf if "huggingface" in url else ms

    monkeypatch.setattr(dl, "check_latency", fake_latency)
    assert dl.get_base_url() == expect


# ----------------------------------------------------------- download_model

def test_download_model_fetches_and_extracts(asset_server, tmp_path):
    asset_server.files["bundle.zip"] = _zip_bytes(
        {"g2p/zh/pinyin.txt": b"a\ta1\n", "g2p/readme": b"hi"})
    dl.download_model("bundle.zip", tmp_path, download_url=_url(asset_server, "%s"))
    assert (tmp_path / "g2p" / "zh" / "pinyin.txt").read_bytes() == b"a\ta1\n"
    assert not (tmp_path / "bundle.zip").exists()  # zip cleaned up


def test_download_model_cleans_up_corrupt_zip(asset_server, tmp_path):
    asset_server.files["bad.zip"] = b"this is not a zip file"
    with pytest.raises(zipfile.BadZipFile):
        dl.download_model("bad.zip", tmp_path, download_url=_url(asset_server, "%s"))
    assert not (tmp_path / "bad.zip").exists()  # no dead file left behind


# -------------------------------------------------- check_pretrained_models

def _bundle_zip():
    return _zip_bytes({
        "chinese-hubert-base/config.json": b"{}",
        "g2p/zh/pinyin.txt": b"a\ta1\n",
        "sv/pretrained_eres2netv2w24s4ep4.ckpt": b"ckpt",
    })


def test_check_pretrained_all_present_no_network(tmp_path, monkeypatch):
    for name in ("chinese-hubert-base", "g2p", "sv"):
        (tmp_path / name).mkdir()

    def boom(*a, **k):
        raise AssertionError("network probe must not run when assets exist")

    monkeypatch.setattr(dl, "get_base_url", boom)
    monkeypatch.setattr(dl, "download_model", boom)
    assert dl.check_pretrained_models(tmp_path) is True


def test_check_pretrained_offline_gating(tmp_path, monkeypatch):
    monkeypatch.setenv("GSV_OFFLINE", "1")

    def boom(*a, **k):
        raise AssertionError("GSV_OFFLINE must suppress all network use")

    monkeypatch.setattr(dl, "get_base_url", boom)
    monkeypatch.setattr(dl, "download_model", boom)
    assert dl.check_pretrained_models(tmp_path) is False


def test_check_pretrained_modelscope_flavor(asset_server, tmp_path, monkeypatch):
    monkeypatch.delenv("GSV_OFFLINE", raising=False)  # conftest pins it
    url = _url(asset_server, "%s")
    monkeypatch.setattr(dl, "MODELSCOPE_BASE_URL", url)
    dl._base_url = url  # the race already picked ModelScope
    asset_server.files["pretrained_models5.zip"] = _bundle_zip()
    dest = tmp_path / "models"
    assert dl.check_pretrained_models(dest) is True
    assert (dest / "sv" / "pretrained_eres2netv2w24s4ep4.ckpt").exists()


def test_check_pretrained_hf_flavor_fetches_g2p_release(asset_server, tmp_path,
                                                        monkeypatch):
    """The HF bundle lacks g2p — it rides the GitHub release URL instead."""
    monkeypatch.delenv("GSV_OFFLINE", raising=False)  # conftest pins it
    url = _url(asset_server, "%s")
    dl._base_url = url  # any non-ModelScope template takes the HF branch
    monkeypatch.setattr(dl, "G2P_RELEASE_URL",
                        _url(asset_server, "release/%s"))
    asset_server.files["pretrained_models6.zip"] = _zip_bytes({
        "chinese-hubert-base/config.json": b"{}",
        "sv/pretrained_eres2netv2w24s4ep4.ckpt": b"ckpt",
    })
    asset_server.files["release/g2p.zip"] = _zip_bytes(
        {"g2p/zh/pinyin.txt": b"a\ta1\n"})
    dest = tmp_path / "models"
    assert dl.check_pretrained_models(dest) is True
    assert (dest / "g2p" / "zh" / "pinyin.txt").exists()


def test_check_pretrained_download_failure_degrades(asset_server, tmp_path,
                                                    monkeypatch):
    monkeypatch.delenv("GSV_OFFLINE", raising=False)  # conftest pins it
    dl._base_url = _url(asset_server, "%s")  # HF branch; asset missing → 404
    dest = tmp_path / "models"
    assert dl.check_pretrained_models(dest) is False  # no raise: degraded


# -------------------------------------------------------------- download_bert

def test_download_bert_offline_gated(tmp_path, monkeypatch):
    monkeypatch.setenv("GSV_OFFLINE", "1")
    assert dl.download_bert(tmp_path) is False


def test_download_bert_success(asset_server, tmp_path, monkeypatch):
    monkeypatch.delenv("GSV_OFFLINE", raising=False)  # conftest pins it
    dl._base_url = _url(asset_server, "%s")
    asset_server.files["chinese-roberta.zip"] = _zip_bytes(
        {"chinese-roberta-wwm-ext-large/config.json": b"{}"})
    assert dl.download_bert(tmp_path) is True
    assert (tmp_path / "chinese-roberta-wwm-ext-large" / "config.json").exists()


def test_download_bert_failure_degrades(asset_server, tmp_path, monkeypatch):
    monkeypatch.delenv("GSV_OFFLINE", raising=False)  # conftest pins it
    dl._base_url = _url(asset_server, "%s")  # 404 on the zip
    assert dl.download_bert(tmp_path) is False
