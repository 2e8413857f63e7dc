"""REST transport: server binding and client proxy.

Route table, auth model, and status mapping mirror the reference
(/root/reference/server-http/src/lib.rs:20-68 route docs, 298-315 Basic auth,
105-122 error mapping; client-http/src/client.rs status handling).
"""

from sda_tpu.http.client import HttpSdaService
from sda_tpu.http.server import SdaHttpServer, serve_background

__all__ = ["HttpSdaService", "SdaHttpServer", "serve_background"]
