/* Browser client for the emotion recognition APIs.
 *
 * Capabilities matching the reference frontend (frontend/app.js in the
 * upstream project): webcam/mic capture, live streaming over WebSocket
 * (canvas JPEG frames at 4 fps + PCM16 audio chunks), one-shot 3-second
 * MediaRecorder upload to POST /predict, probability bar rendering, and
 * backend URL resolution via ?backend= query param / window.BACKEND_URL /
 * port-8002 fallback.
 */

(() => {
  "use strict";

  const FRAME_INTERVAL_MS = 250;   // 4 fps
  const RECORD_MS = 3000;
  const AUDIO_CHUNK = 2048;

  function backendUrl() {
    const q = new URLSearchParams(window.location.search).get("backend");
    if (q) return q.replace(/\/$/, "");
    if (window.BACKEND_URL) return window.BACKEND_URL.replace(/\/$/, "");
    return `${window.location.protocol}//${window.location.hostname}:8002`;
  }

  class EmotionClient {
    constructor() {
      this.base = backendUrl();
      this.stream = null;
      this.ws = null;
      this.frameTimer = null;
      this.audioCtx = null;
      this.processor = null;

      this.video = document.getElementById("preview");
      this.statusEl = document.getElementById("status");
      this.top1El = document.getElementById("top1");
      this.barsEl = document.getElementById("bars");
      this.metaEl = document.getElementById("meta");
      this.btnLive = document.getElementById("btn-live");
      this.btnStop = document.getElementById("btn-stop");
      this.btnRecord = document.getElementById("btn-record");

      this.btnLive.onclick = () => this.startLive().catch((e) => this.setStatus(`Error: ${e.message}`));
      this.btnStop.onclick = () => this.stopLive();
      this.btnRecord.onclick = () => this.recordAndPredict().catch((e) => this.setStatus(`Error: ${e.message}`));

      this.canvas = document.createElement("canvas");
    }

    setStatus(text) { this.statusEl.textContent = text; }

    async ensureMedia() {
      if (this.stream) return this.stream;
      this.stream = await navigator.mediaDevices.getUserMedia({
        video: { width: 320, height: 240 },
        audio: { sampleRate: 16000, channelCount: 1 },
      });
      this.video.srcObject = this.stream;
      return this.stream;
    }

    /* ---- live streaming ---- */

    async startLive() {
      await this.ensureMedia();
      const wsUrl = this.base.replace(/^http/, "ws") + "/ws/stream";
      this.ws = new WebSocket(wsUrl);

      this.ws.onopen = () => {
        this.setStatus("Streaming…");
        this.ws.send(JSON.stringify({ type: "start" }));
        this.startFramePump();
        this.startAudioPump();
        this.btnLive.disabled = true;
        this.btnStop.disabled = false;
      };
      this.ws.onmessage = (ev) => {
        const msg = JSON.parse(ev.data);
        if (msg.type === "prediction") this.renderPrediction(msg.payload);
        else if (msg.type === "error") this.setStatus(`Server: ${msg.detail}`);
      };
      this.ws.onclose = () => this.stopLive();
      this.ws.onerror = () => this.setStatus("WebSocket error");
    }

    startFramePump() {
      const ctx2d = this.canvas.getContext("2d");
      this.frameTimer = setInterval(() => {
        if (!this.ws || this.ws.readyState !== WebSocket.OPEN) return;
        this.canvas.width = this.video.videoWidth || 320;
        this.canvas.height = this.video.videoHeight || 240;
        ctx2d.drawImage(this.video, 0, 0, this.canvas.width, this.canvas.height);
        const b64 = this.canvas.toDataURL("image/jpeg", 0.7);
        this.ws.send(JSON.stringify({
          type: "frame",
          image_b64: b64,
          timestamp: performance.now() / 1000,
        }));
      }, FRAME_INTERVAL_MS);
    }

    startAudioPump() {
      this.audioCtx = new (window.AudioContext || window.webkitAudioContext)();
      const source = this.audioCtx.createMediaStreamSource(this.stream);
      this.processor = this.audioCtx.createScriptProcessor(AUDIO_CHUNK, 1, 1);
      const sampleRate = this.audioCtx.sampleRate;
      this.processor.onaudioprocess = (ev) => {
        if (!this.ws || this.ws.readyState !== WebSocket.OPEN) return;
        const f32 = ev.inputBuffer.getChannelData(0);
        const pcm = new Int16Array(f32.length);
        for (let i = 0; i < f32.length; i++) {
          pcm[i] = Math.max(-32768, Math.min(32767, Math.round(f32[i] * 32768)));
        }
        const bytes = new Uint8Array(pcm.buffer);
        let bin = "";
        for (let i = 0; i < bytes.length; i += 0x8000) {
          bin += String.fromCharCode.apply(null, bytes.subarray(i, i + 0x8000));
        }
        const b64 = btoa(bin);
        this.ws.send(JSON.stringify({
          type: "audio",
          pcm_b64: b64,
          sample_rate: sampleRate,
          timestamp: performance.now() / 1000,
        }));
      };
      source.connect(this.processor);
      this.processor.connect(this.audioCtx.destination);
    }

    stopLive() {
      if (this.frameTimer) clearInterval(this.frameTimer);
      this.frameTimer = null;
      if (this.processor) { this.processor.disconnect(); this.processor = null; }
      if (this.audioCtx) { this.audioCtx.close(); this.audioCtx = null; }
      if (this.ws && this.ws.readyState === WebSocket.OPEN) {
        this.ws.send(JSON.stringify({ type: "stop" }));
        this.ws.close();
      }
      this.ws = null;
      this.btnLive.disabled = false;
      this.btnStop.disabled = true;
      this.setStatus("Idle");
    }

    /* ---- one-shot clip ---- */

    async recordAndPredict() {
      await this.ensureMedia();
      this.setStatus("Recording 3 s…");
      const chunks = [];
      const recorder = new MediaRecorder(this.stream, { mimeType: "video/webm" });
      recorder.ondataavailable = (e) => { if (e.data.size) chunks.push(e.data); };
      const done = new Promise((resolve) => { recorder.onstop = resolve; });
      recorder.start();
      await new Promise((r) => setTimeout(r, RECORD_MS));
      recorder.stop();
      await done;

      this.setStatus("Uploading…");
      const blob = new Blob(chunks, { type: "video/webm" });
      const form = new FormData();
      form.append("file", blob, "clip.webm");
      const resp = await fetch(`${this.base}/predict`, { method: "POST", body: form });
      if (!resp.ok) throw new Error(`HTTP ${resp.status}`);
      const result = await resp.json();
      this.renderPrediction(result);
      this.setStatus("Done");
    }

    /* ---- rendering ---- */

    renderPrediction(payload) {
      const labels = payload.labels || [];
      let probs = payload.probs || [];
      // The queued worker reports 0..1, the direct backend percent — normalize.
      const total = probs.reduce((a, b) => a + b, 0);
      const pct = total > 1.5 ? probs : probs.map((p) => p * 100);

      if (payload.top1) {
        const p = payload.top1.prob;
        const shown = total > 1.5 ? p : p * 100;
        this.top1El.textContent = `${payload.top1.label} (${shown.toFixed(1)}%)`;
      }
      this.barsEl.innerHTML = "";
      labels.forEach((label, i) => {
        const row = document.createElement("div");
        row.className = "bar-row";
        row.innerHTML = `
          <span class="bar-label">${label}</span>
          <span class="bar-track"><span class="bar-fill" style="width:${Math.min(100, pct[i]).toFixed(1)}%"></span></span>
          <span class="bar-value">${pct[i].toFixed(1)}%</span>`;
        this.barsEl.appendChild(row);
      });
      const bits = [];
      if (payload.queue_delay_ms !== undefined) bits.push(`queue ${payload.queue_delay_ms} ms`);
      if (payload.num_buffered_frames !== undefined) bits.push(`${payload.num_buffered_frames} frames`);
      if (payload.error) bits.push(`error: ${payload.error}`);
      this.metaEl.textContent = bits.join(" · ");
    }
  }

  window.addEventListener("DOMContentLoaded", () => { new EmotionClient(); });
})();
