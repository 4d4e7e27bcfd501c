"""htsget protocol tests against a local mock server (HtsgetReader.java parity)."""
import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np
import pytest

from gatk_tpu.io import bam as bamio, sam as samio
from gatk_tpu.io.htsget import HtsgetReader, fetch_reads_ticket
from gatk_tpu.io.reads import Read


def _make_bam_bytes(tmp_path, positions):
    header = samio.SamHeader(sequences=[samio.SequenceRecord("chr1", 100000, 0)])
    path = tmp_path / "src.bam"
    w = bamio.BamWriter(str(path), header)
    for i, pos in enumerate(positions):
        w.write(Read(name=f"r{i}", flag=0, ref_id=0, pos=pos, mapq=60,
                     cigar_ops=np.array([0], np.uint8), cigar_lens=np.array([50], np.int32),
                     bases=np.full(50, ord("A"), np.uint8), quals=np.full(50, 30, np.uint8)))
    w.close()
    return path.read_bytes()


@pytest.fixture()
def htsget_server(tmp_path):
    full = _make_bam_bytes(tmp_path, [100, 5000, 20000])
    subset = _make_bam_bytes(tmp_path, [5000])

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            parsed = urlparse(self.path)
            if not parsed.path.startswith("/reads/"):
                self.send_response(404)
                self.end_headers()
                return
            qs = parse_qs(parsed.query)
            payload = subset if "referenceName" in qs else full
            # split into two data-URI blocks to exercise concatenation
            mid = len(payload) // 2
            ticket = {"htsget": {"format": "BAM", "urls": [
                {"url": "data:application/octet-stream;base64,"
                        + base64.b64encode(payload[:mid]).decode()},
                {"url": "data:application/octet-stream;base64,"
                        + base64.b64encode(payload[mid:]).decode()},
            ]}}
            body = json.dumps(ticket).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/vnd.ga4gh.htsget.v1.2.0+json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def test_htsget_full_and_range(htsget_server):
    reader = HtsgetReader(htsget_server, "sample1")
    ticket = fetch_reads_ticket(htsget_server, "sample1")
    assert ticket["format"] == "BAM" and len(ticket["urls"]) == 2
    recs = list(reader)
    assert [r.pos for r in recs] == [100, 5000, 20000]
    assert reader.header.sequences[0].name == "chr1"
    hits = list(reader.query("chr1", 4000, 6000))
    assert [r.pos for r in hits] == [5000]
    reader.close()
