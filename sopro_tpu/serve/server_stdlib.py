"""Dependency-free HTTP server for the SoproTTS serving contract.

This image ships no fastapi/uvicorn, so the primary server here is a
threaded stdlib `http.server` implementing the same endpoints and SPRO wire
protocol as serve/server.py (and the reference demo, demo/server.py:145-255):

  GET  /            GET /healthz    GET /v1/stats
  POST /v1/reference/cache          (multipart: ref_audio, ref_seconds)
  POST /v1/audio/speech             (multipart/urlencoded form; stream=true
                                     -> chunked SPRO framed-PCM)

Every request is a continuous-batching session — concurrent clients stream
simultaneously (the reference serializes behind a lock).
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple
from urllib.parse import parse_qsl

from sopro_tpu.serve import server as core


# --------------------------------------------------------------------------
# tiny multipart/form-data parser (no cgi dependency)
# --------------------------------------------------------------------------


def parse_form(
    content_type: str, body: bytes
) -> Tuple[Dict[str, str], Dict[str, Tuple[str, bytes]]]:
    """-> (fields, files{name: (filename, data)})."""
    fields: Dict[str, str] = {}
    files: Dict[str, Tuple[str, bytes]] = {}
    ct = (content_type or "").lower()
    if ct.startswith("application/x-www-form-urlencoded"):
        fields.update(parse_qsl(body.decode("utf-8", "replace")))
        return fields, files
    if not ct.startswith("multipart/form-data"):
        return fields, files

    boundary = None
    for part in content_type.split(";"):
        part = part.strip()
        if part.startswith("boundary="):
            boundary = part[len("boundary="):].strip('"')
    if not boundary:
        return fields, files

    delim = b"--" + boundary.encode()
    for chunk in body.split(delim):
        chunk = chunk.strip(b"\r\n")
        if not chunk or chunk == b"--":
            continue
        if b"\r\n\r\n" not in chunk:
            continue
        raw_headers, data = chunk.split(b"\r\n\r\n", 1)
        disp = ""
        for line in raw_headers.decode("utf-8", "replace").split("\r\n"):
            if line.lower().startswith("content-disposition:"):
                disp = line
        name, filename = None, None
        for piece in disp.split(";"):
            piece = piece.strip()
            if piece.startswith("name="):
                name = piece[5:].strip('"')
            elif piece.startswith("filename="):
                filename = piece[9:].strip('"')
        if name is None:
            continue
        if filename is not None:
            files[name] = (filename, data)
        else:
            fields[name] = data.decode("utf-8", "replace")
    return fields, files


# --------------------------------------------------------------------------
# handler
# --------------------------------------------------------------------------


class Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "sopro-tpu/1.5"

    def log_message(self, fmt, *args):  # quiet by default
        if os.environ.get("SOPRO_HTTP_LOG"):
            super().log_message(fmt, *args)

    # -- helpers ----------------------------------------------------------

    def _json(self, code: int, obj) -> None:
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _bytes(self, code: int, data: bytes, ctype: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _read_body(self) -> bytes:
        n = int(self.headers.get("Content-Length", "0") or "0")
        return self.rfile.read(n) if n else b""

    # -- routes -----------------------------------------------------------

    def do_GET(self):
        if self.path == "/healthz":
            return self._json(200, {"ok": True})
        if self.path == "/v1/stats":
            _, batcher = core.get_tts()
            return self._json(200, batcher.stats())
        if self.path == "/" or self.path.startswith("/static/"):
            static_dir = os.path.join(os.path.dirname(__file__), "static")
            rel = "index.html" if self.path == "/" else self.path[len("/static/"):]
            target = os.path.realpath(os.path.join(static_dir, rel))
            if target.startswith(os.path.realpath(static_dir) + os.sep) or (
                rel == "index.html" and os.path.exists(target)
            ):
                if os.path.exists(target):
                    ctype = (
                        "text/html" if target.endswith(".html")
                        else "text/javascript" if target.endswith(".js")
                        else "application/octet-stream"
                    )
                    with open(target, "rb") as f:
                        return self._bytes(200, f.read(), ctype)
            if self.path == "/":
                return self._bytes(
                    200, b"<h1>sopro-tpu</h1><p>POST /v1/audio/speech</p>",
                    "text/html",
                )
        return self._json(404, {"detail": "not found"})

    def do_POST(self):
        body = self._read_body()
        fields, files = parse_form(self.headers.get("Content-Type", ""), body)

        if self.path == "/v1/reference/cache":
            return self._cache_reference(fields, files)
        if self.path == "/v1/audio/speech":
            return self._speech(fields, files)
        return self._json(404, {"detail": "not found"})

    def _cache_reference(self, fields, files):
        if "ref_audio" not in files or not files["ref_audio"][1]:
            return self._json(400, {"detail": "Empty `ref_audio` upload."})
        filename, data = files["ref_audio"]
        tts, _ = core.get_tts()
        rs = core._effective_ref_seconds(
            float(fields["ref_seconds"]) if fields.get("ref_seconds") else None
        )
        suffix = os.path.splitext(filename or "")[-1] or ".wav"
        try:
            core.get_or_compute_ref(tts, data, suffix=suffix, ref_seconds=rs)
        except ValueError as e:  # undecodable container, bad audio payload
            return self._json(400, {"detail": str(e)})
        return self._json(
            200, {"ref_id": core.sha256_bytes(data), "ref_seconds": rs}
        )

    def _speech(self, fields, files):
        text = fields.get("input", "")
        if not text.strip():
            return self._json(400, {"detail": "`input` must be non-empty."})
        tts, batcher = core.get_tts()
        rs = core._effective_ref_seconds(
            float(fields["ref_seconds"]) if fields.get("ref_seconds") else None
        )
        ref_id = fields.get("ref_id")
        has_file = "ref_audio" in files and bool(files["ref_audio"][1])
        if (ref_id is None) == (not has_file):
            return self._json(
                400, {"detail": "Provide exactly one of `ref_id` or `ref_audio`."}
            )

        if ref_id is not None:
            if not core.valid_ref_id(ref_id):
                return self._json(
                    400, {"detail": "`ref_id` must be a sha256 hex digest."}
                )
            p = core.sv_cache_path(ref_id, rs)
            if not os.path.exists(p):
                return self._json(
                    404,
                    {"detail": "Cached reference not found. Cache it first."},
                )
            ref = core.load_prepared_reference(p)
        else:
            filename, data = files["ref_audio"]
            suffix = os.path.splitext(filename or "")[-1] or ".wav"
            try:
                ref = core.get_or_compute_ref(
                    tts, data, suffix=suffix, ref_seconds=rs
                )
            except ValueError as e:  # undecodable container
                return self._json(400, {"detail": str(e)})

        max_frames = int(max(1, min(int(fields.get("max_frames", 400)), 2000)))
        # effective cap is reported, never silently applied (see server.py)
        effective_max = min(max_frames, batcher.max_frames_cap)
        top_p = float(max(0.01, min(float(fields.get("top_p", 0.9)), 1.0)))
        temperature = float(
            max(0.05, min(float(fields.get("temperature", 1.05)), 3.0))
        )
        style = float(
            max(0.0, min(float(fields.get("style_strength", 1.2)), 3.0))
        )
        stream = str(fields.get("stream", "false")).lower() in ("1", "true", "yes")
        seed = int(fields.get("seed", 0))
        anti_loop = str(fields.get("anti_loop", "true")).lower() in (
            "1", "true", "yes"
        )

        try:
            handle = batcher.submit(
                text, ref, top_p=top_p, temperature=temperature,
                style_strength=style, max_frames=max_frames, seed=seed,
                anti_loop=anti_loop,
            )
        except ValueError as e:  # over-length text
            return self._json(400, {"detail": str(e)})

        if not stream:
            import numpy as np

            chunks = list(handle.chunks())
            wav = (
                np.concatenate(chunks, axis=1)
                if chunks else np.zeros((1, 0), np.float32)
            )
            data = core.wav_bytes_from_float(wav, core.TARGET_SR)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(data)))
            self.send_header("X-Sopro-Max-Frames", str(effective_max))
            self.end_headers()
            self.wfile.write(data)
            return

        # chunked streaming of SPRO frames
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Transfer-Encoding", "chunked")
        self.send_header("X-Sopro-Max-Frames", str(effective_max))
        self.end_headers()

        def send(chunk: bytes):
            self.wfile.write(f"{len(chunk):x}\r\n".encode())
            self.wfile.write(chunk)
            self.wfile.write(b"\r\n")

        try:
            send(core.stream_header(core.TARGET_SR, 1))
            for c in handle.chunks():
                payload = core.float_to_pcm16le(c)
                if payload:
                    send(core.frame(payload))
            self.wfile.write(b"0\r\n\r\n")
        except (BrokenPipeError, ConnectionResetError):
            # client went away: stop decoding and free the slot immediately
            handle.cancel()
            for _ in handle.chunks():
                pass


def serve(host: str = "0.0.0.0", port: int = 8000) -> ThreadingHTTPServer:
    httpd = ThreadingHTTPServer((host, port), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd


def main():
    host = os.environ.get("SOPRO_HOST", "0.0.0.0")
    port = int(os.environ.get("SOPRO_PORT", "8000"))
    core.get_tts()  # load model + start scheduler before accepting traffic
    httpd = ThreadingHTTPServer((host, port), Handler)
    print(f"sopro-tpu serving on http://{host}:{port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
