#!/usr/bin/env python
"""Live SLAM viewer: a zero-dependency web UI over the HeadlessViewer feed.

The reference ships an Open3D GUI process consuming GaussianPackets over an
mp.Queue (utils/slam_frontend.py:1524-1531; its gui/ directory is absent
from the snapshot). This framework's GUI layer is split the TPU-native way:
SLAM emits the same packets into `HeadlessViewer` (lvdgs_tpu/gui), which
writes `live_*.png` render frames, `trajectory.jsonl` pose records and
`live_map.ply` under Results.save_dir — and THIS tool serves them as a live
browser view (auto-refreshing render, top-down trajectory with keyframe
markers, an interactive WebGL 3D point view of the gaussian map — orbit/
zoom/pan, self-contained shaders so it works on zero-egress hosts — and
map download). Works over SSH port-forwarding on headless TPU hosts,
where an X/Open3D viewer cannot.

Run alongside (or after) a SLAM run with `Results.use_gui: true`:
    python tools/live_viewer.py --dir results/<run>/gui [--port 8433]
"""
import argparse
import glob
import http.server
import json
import os
import socketserver
import struct

import numpy as np

SH_C0 = 0.28209479177387814


def ply_to_points(path: str, max_points: int = 120000) -> bytes:
    """Parse the Inria-3DGS binary PLY written by io/ply.py into a compact
    interleaved [x,y,z,r,g,b] float32 buffer for the WebGL view (colors from
    the DC SH band, alpha-culled, uniformly subsampled to max_points)."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            chunk = f.readline()
            if not chunk:
                return b""
            header += chunk
        n = 0
        props = []
        for line in header.decode("ascii", "replace").splitlines():
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("property float"):
                props.append(line.split()[-1])
        data = np.frombuffer(f.read(n * len(props) * 4), dtype="<f4")
    if n == 0 or not props:
        return b""
    data = data.reshape(n, len(props))
    col = {p: i for i, p in enumerate(props)}
    xyz = data[:, [col["x"], col["y"], col["z"]]]
    rgb = 0.5 + SH_C0 * data[:, [col[f"f_dc_{i}"] for i in range(3)]]
    if "opacity" in col:
        alpha = 1.0 / (1.0 + np.exp(-data[:, col["opacity"]]))
        keep = alpha > 0.05
        xyz, rgb = xyz[keep], rgb[keep]
    if len(xyz) > max_points:
        idx = np.linspace(0, len(xyz) - 1, max_points).astype(np.int64)
        xyz, rgb = xyz[idx], rgb[idx]
    out = np.concatenate([xyz, np.clip(rgb, 0, 1)], axis=1).astype("<f4")
    return struct.pack("<I", out.shape[0]) + out.tobytes()

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
 <div class="card"><canvas id="map3d" width="640" height="480"></canvas>
  <div id="mstats">3D map: drag = orbit · wheel = zoom · shift-drag = pan
   · <a href="#" id="reload3d">reload points</a></div>
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

// ---------------- self-contained WebGL point-cloud view (no deps:
// zero-egress hosts cannot load three.js; this is a ~100-line orbit viewer)
const gl=(()=>{const cv=document.getElementById('map3d');
  return cv.getContext('webgl',{antialias:true});})();
let npts=0, theta=-0.6, phi=0.35, dist=30, target=[0,0,0], autoFit=true;
if(gl){
  const vs=`attribute vec3 p;attribute vec3 c;uniform mat4 mvp;
    varying vec3 vc;void main(){gl_Position=mvp*vec4(p,1.0);
    gl_PointSize=max(1.5,6.0-0.08*gl_Position.w);vc=c;}`;
  const fs=`precision mediump float;varying vec3 vc;
    void main(){gl_FragColor=vec4(vc,1.0);}`;
  const sh=(t,s)=>{const o=gl.createShader(t);gl.shaderSource(o,s);
    gl.compileShader(o);return o;};
  const prog=gl.createProgram();
  gl.attachShader(prog,sh(gl.VERTEX_SHADER,vs));
  gl.attachShader(prog,sh(gl.FRAGMENT_SHADER,fs));
  gl.linkProgram(prog);gl.useProgram(prog);
  const buf=gl.createBuffer();
  const locP=gl.getAttribLocation(prog,'p'),locC=gl.getAttribLocation(prog,'c');
  const locM=gl.getUniformLocation(prog,'mvp');
  gl.enable(gl.DEPTH_TEST);

  function mat(){
    // look-at target from spherical (theta,phi,dist), then perspective
    const cx=target[0]+dist*Math.cos(phi)*Math.sin(theta);
    const cy=target[1]-dist*Math.sin(phi);
    const cz=target[2]-dist*Math.cos(phi)*Math.cos(theta);
    let f=[target[0]-cx,target[1]-cy,target[2]-cz];
    const fl=Math.hypot(...f);f=f.map(v=>v/fl);
    let up=[0,-1,0];
    let s=[f[1]*up[2]-f[2]*up[1],f[2]*up[0]-f[0]*up[2],f[0]*up[1]-f[1]*up[0]];
    const sl=Math.hypot(...s);s=s.map(v=>v/sl);
    const u=[s[1]*f[2]-s[2]*f[1],s[2]*f[0]-s[0]*f[2],s[0]*f[1]-s[1]*f[0]];
    const tx=-(s[0]*cx+s[1]*cy+s[2]*cz);
    const ty=-(u[0]*cx+u[1]*cy+u[2]*cz);
    const tz= (f[0]*cx+f[1]*cy+f[2]*cz);
    const n=0.1,fa=5000,asp=640/480,t=n*Math.tan(0.45),r=t*asp;
    // column-major MVP = P * V
    const V=[s[0],u[0],-f[0],0, s[1],u[1],-f[1],0, s[2],u[2],-f[2],0,
             tx,ty,tz,1];
    const P=[n/r,0,0,0, 0,n/t,0,0, 0,0,-(fa+n)/(fa-n),-1,
             0,0,-2*fa*n/(fa-n),0];
    const M=new Float32Array(16);
    for(let i=0;i<4;i++)for(let j=0;j<4;j++){let a=0;
      for(let k=0;k<4;k++)a+=P[k*4+j]*V[i*4+k];M[i*4+j]=a;}
    return M;
  }
  function render3d(){
    gl.viewport(0,0,640,480);gl.clearColor(0.063,0.07,0.086,1);
    gl.clear(gl.COLOR_BUFFER_BIT|gl.DEPTH_BUFFER_BIT);
    if(!npts)return;
    gl.uniformMatrix4fv(locM,false,mat());
    gl.drawArrays(gl.POINTS,0,npts);
  }
  async function loadPoints(){
    try{
      const r=await fetch('/points?t='+Date.now());
      if(!r.ok)return;
      const ab=await r.arrayBuffer();
      if(ab.byteLength<4)return;
      npts=new Uint32Array(ab,0,1)[0];
      const arr=new Float32Array(ab,4);
      gl.bindBuffer(gl.ARRAY_BUFFER,buf);
      gl.bufferData(gl.ARRAY_BUFFER,arr,gl.STATIC_DRAW);
      gl.enableVertexAttribArray(locP);
      gl.vertexAttribPointer(locP,3,gl.FLOAT,false,24,0);
      gl.enableVertexAttribArray(locC);
      gl.vertexAttribPointer(locC,3,gl.FLOAT,false,24,12);
      if(autoFit&&npts){
        // center/scale once from a sample
        let mn=[1e9,1e9,1e9],mx=[-1e9,-1e9,-1e9];
        for(let i=0;i<npts;i+=Math.max(1,(npts/2000)|0))
          for(let k=0;k<3;k++){const v=arr[i*6+k];
            if(v<mn[k])mn[k]=v;if(v>mx[k])mx[k]=v;}
        target=[(mn[0]+mx[0])/2,(mn[1]+mx[1])/2,(mn[2]+mx[2])/2];
        dist=Math.max(mx[0]-mn[0],mx[1]-mn[1],mx[2]-mn[2])*0.9+1;
        autoFit=false;
      }
      document.getElementById('mstats').firstChild.textContent=
        '3D map: '+npts+' gaussians · drag = orbit · wheel = zoom ';
      render3d();
    }catch(e){}
  }
  const cv3=document.getElementById('map3d');
  let drag=null;
  cv3.addEventListener('mousedown',e=>{drag=[e.clientX,e.clientY,e.shiftKey];});
  window.addEventListener('mouseup',()=>{drag=null;});
  window.addEventListener('mousemove',e=>{
    if(!drag)return;
    const dx=e.clientX-drag[0],dy=e.clientY-drag[1];
    if(drag[2]){ // pan in view plane
      const s=dist*0.002;
      target[0]-=Math.cos(theta)*dx*s; target[2]-=Math.sin(theta)*dx*s;
      target[1]-=dy*s;
    }else{theta+=dx*0.008;phi=Math.min(1.5,Math.max(-1.5,phi+dy*0.008));}
    drag=[e.clientX,e.clientY,drag[2]];render3d();});
  cv3.addEventListener('wheel',e=>{e.preventDefault();
    dist*=Math.exp(e.deltaY*0.001);render3d();},{passive:false});
  document.getElementById('reload3d').addEventListener('click',
    e=>{e.preventDefault();loadPoints();});
  loadPoints();
  setInterval(loadPoints, 15000);
}
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
        elif path == "/points":
            ply = os.path.join(self.feed_dir, "live_map.ply")
            if not os.path.exists(ply):
                self._send(404, "text/plain", b"no map yet")
                return
            try:
                body = ply_to_points(ply)
            except Exception:
                body = b""  # mid-write PLY; client retries on its interval
            if not body:
                self._send(503, "text/plain", b"map not readable yet")
                return
            self._send(200, "application/octet-stream", body)
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
