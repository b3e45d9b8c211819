#!/usr/bin/env python
"""Live SLAM viewer: a zero-dependency web UI over the HeadlessViewer feed.

The reference ships an Open3D GUI process consuming GaussianPackets over an
mp.Queue (utils/slam_frontend.py:1524-1531; its gui/ directory is absent
from the snapshot). This framework's GUI layer is split the TPU-native way:
SLAM emits the same packets into `HeadlessViewer` (lvdgs_tpu/gui), which
writes `live_*.png` render frames, `trajectory.jsonl` pose records and
`live_map.ply` under Results.save_dir — and THIS tool serves them as a live
browser view (auto-refreshing render, top-down trajectory with keyframe
markers, map download). Works over SSH port-forwarding on headless TPU
hosts, where an X/Open3D viewer cannot.

Run alongside (or after) a SLAM run with `Results.use_gui: true`:
    python tools/live_viewer.py --dir results/<run>/gui [--port 8433]
"""
import argparse
import glob
import http.server
import json
import os
import socketserver

PAGE = """<!DOCTYPE html>
<html><head><title>LVD-GS-TPU live</title><style>
body{font-family:system-ui,sans-serif;background:#14161a;color:#d7dae0;
     margin:0;padding:16px}
h1{font-size:16px;font-weight:600;margin:0 0 12px}
.row{display:flex;gap:16px;flex-wrap:wrap}
.card{background:#1d2026;border-radius:8px;padding:12px}
img{max-width:900px;width:100%;border-radius:4px;display:block}
canvas{background:#101216;border-radius:4px}
#stats{font-size:13px;color:#9aa0ab;margin-top:8px}
a{color:#7ab7ff}
</style></head><body>
<h1>LVD-GS-TPU — live SLAM feed</h1>
<div class="row">
 <div class="card"><img id="frame" src="/frame"/>
  <div id="stats">waiting for frames…</div></div>
 <div class="card"><canvas id="traj" width="420" height="420"></canvas>
  <div id="tstats"></div>
  <div style="margin-top:6px"><a href="/map.ply">download live_map.ply</a></div>
 </div>
</div>
<script>
async function tick(){
  const img=document.getElementById('frame');
  img.src='/frame?t='+Date.now();
  try{
    const r=await fetch('/trajectory');
    const recs=await r.json();
    draw(recs);
    document.getElementById('stats').textContent=
      recs.length? ('frame '+recs[recs.length-1].frame.uid+
                    ' · '+recs.length+' packets') : 'no packets yet';
  }catch(e){}
  setTimeout(tick, 1000);
}
function center(R,T){
  // w2c -> camera center: -R^T T
  const c=[0,0,0];
  for(let i=0;i<3;i++){c[i]=-(R[0][i]*T[0]+R[1][i]*T[1]+R[2][i]*T[2]);}
  return c;
}
function draw(recs){
  const cv=document.getElementById('traj'),g=cv.getContext('2d');
  g.clearRect(0,0,cv.width,cv.height);
  if(!recs.length)return;
  const pts=recs.map(r=>center(r.frame.R,r.frame.T));
  const kf=recs[recs.length-1].keyframes.map(k=>center(k.R,k.T));
  const xs=pts.map(p=>p[0]).concat(kf.map(p=>p[0]));
  const zs=pts.map(p=>p[2]).concat(kf.map(p=>p[2]));
  const x0=Math.min(...xs),x1=Math.max(...xs);
  const z0=Math.min(...zs),z1=Math.max(...zs);
  const s=Math.min(380/Math.max(x1-x0,1e-3),380/Math.max(z1-z0,1e-3));
  const px=p=>[20+(p[0]-x0)*s, cv.height-20-(p[2]-z0)*s];
  g.strokeStyle='#7ab7ff';g.lineWidth=2;g.beginPath();
  pts.forEach((p,i)=>{const q=px(p);i?g.lineTo(q[0],q[1]):g.moveTo(q[0],q[1]);});
  g.stroke();
  g.fillStyle='#ffb454';
  kf.forEach(p=>{const q=px(p);g.fillRect(q[0]-3,q[1]-3,6,6);});
  const last=px(pts[pts.length-1]);
  g.fillStyle='#ff5d5d';g.beginPath();
  g.arc(last[0],last[1],5,0,7);g.fill();
  document.getElementById('tstats').textContent=
    'trajectory (top-down x/z) · '+kf.length+' window keyframes';
}
tick();
</script></body></html>"""


class Handler(http.server.BaseHTTPRequestHandler):
    feed_dir = "."

    def log_message(self, *a):  # quiet
        pass

    def _send(self, code, ctype, body):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Cache-Control", "no-store")
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        path = self.path.split("?")[0]
        if path == "/":
            self._send(200, "text/html; charset=utf-8", PAGE.encode())
        elif path == "/frame":
            frames = sorted(glob.glob(os.path.join(self.feed_dir, "live_*.png")))
            if not frames:
                self._send(404, "text/plain", b"no frames yet")
                return
            with open(frames[-1], "rb") as f:
                self._send(200, "image/png", f.read())
        elif path == "/trajectory":
            trj = os.path.join(self.feed_dir, "trajectory.jsonl")
            recs = []
            if os.path.exists(trj):
                with open(trj) as f:
                    for line in f:
                        line = line.strip()
                        if line:
                            try:
                                recs.append(json.loads(line))
                            except json.JSONDecodeError:
                                pass  # mid-write tail line
            self._send(200, "application/json", json.dumps(recs).encode())
        elif path == "/map.ply":
            ply = os.path.join(self.feed_dir, "live_map.ply")
            if not os.path.exists(ply):
                self._send(404, "text/plain", b"no map yet")
                return
            with open(ply, "rb") as f:
                self._send(200, "application/octet-stream", f.read())
        else:
            self._send(404, "text/plain", b"not found")


def serve(feed_dir: str, port: int):
    Handler.feed_dir = feed_dir

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    with Server(("127.0.0.1", port), Handler) as httpd:
        print(f"live viewer: http://127.0.0.1:{port}/  (feed: {feed_dir})")
        httpd.serve_forever()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True, help="HeadlessViewer feed dir")
    ap.add_argument("--port", type=int, default=8433)
    args = ap.parse_args()
    serve(args.dir, args.port)
