/* chatterbox-tpu web console.
 * Feature parity with the reference console (voice CRUD, TTS settings in
 * localStorage, streaming playback via blob / MediaSource for fMP4, status
 * polling) — original implementation. */
(() => {
  const $ = (id) => document.getElementById(id);
  const SETTING_IDS = [
    "api-key", "format", "cfg_guidance_weight", "synthesis_temperature",
    "text_processing_chunk_size", "audio_tokens_per_slice",
    "remove_leading_milliseconds", "remove_trailing_milliseconds",
    "chunk_overlap_strategy", "crossfade_duration_milliseconds",
  ];

  // ---- settings persistence -------------------------------------------------
  const loadSettings = () => {
    for (const id of SETTING_IDS) {
      const saved = localStorage.getItem("cbx:" + id);
      if (saved !== null && $(id)) $(id).value = saved;
    }
  };
  const saveSettings = () => {
    for (const id of SETTING_IDS) {
      if ($(id)) localStorage.setItem("cbx:" + id, $(id).value);
    }
  };
  document.addEventListener("change", saveSettings);

  const apiKey = () => $("api-key").value.trim();
  const headers = () => ({ "X-API-Key": apiKey() });

  // ---- voices ---------------------------------------------------------------
  async function refreshVoices() {
    try {
      const res = await fetch("/voices", { headers: headers() });
      if (!res.ok) return;
      const voices = await res.json();
      const select = $("voice");
      const current = select.value;
      select.innerHTML = '<option value="">(default)</option>';
      const list = $("voice-list");
      list.innerHTML = "";
      for (const v of voices) {
        const opt = document.createElement("option");
        opt.value = v; opt.textContent = v;
        select.appendChild(opt);
        const li = document.createElement("li");
        const name = document.createElement("span");
        name.textContent = v;
        const del = document.createElement("button");
        del.className = "ghost"; del.textContent = "delete";
        del.onclick = async () => {
          await fetch(`/voices/${encodeURIComponent(v)}`, { method: "DELETE", headers: headers() });
          refreshVoices();
        };
        li.append(name, del);
        list.appendChild(li);
      }
      select.value = current;
    } catch (e) { /* server not up yet */ }
  }

  $("upload").onclick = async () => {
    const file = $("voice-file").files[0];
    if (!file) return alert("Choose a wav file first");
    const form = new FormData();
    form.append("file", file);
    const res = await fetch("/voices", { method: "POST", headers: headers(), body: form });
    if (res.status === 409) alert("A voice with that filename already exists.");
    else if (!res.ok) alert("Upload failed: " + res.status);
    refreshVoices();
  };

  // ---- synthesis ------------------------------------------------------------
  let controller = null;

  $("speak").onclick = async () => {
    saveSettings();
    const body = {
      text: $("text").value,
      voice_id: $("voice").value || null,
      format: $("format").value,
      cfg_guidance_weight: parseFloat($("cfg_guidance_weight").value),
      synthesis_temperature: parseFloat($("synthesis_temperature").value),
      text_processing_chunk_size: parseInt($("text_processing_chunk_size").value),
      audio_tokens_per_slice: parseInt($("audio_tokens_per_slice").value),
      remove_leading_milliseconds: parseInt($("remove_leading_milliseconds").value),
      remove_trailing_milliseconds: parseInt($("remove_trailing_milliseconds").value),
      chunk_overlap_strategy: $("chunk_overlap_strategy").value,
      crossfade_duration_milliseconds: parseInt($("crossfade_duration_milliseconds").value),
    };
    controller = new AbortController();
    $("speak").disabled = true; $("stop").disabled = false;
    $("latency").textContent = "requesting...";
    const started = performance.now();
    try {
      const res = await fetch("/tts/generate", {
        method: "POST",
        headers: { ...headers(), "Content-Type": "application/json" },
        body: JSON.stringify(body),
        signal: controller.signal,
      });
      if (!res.ok) throw new Error("HTTP " + res.status);
      const mime = res.headers.get("Content-Type") || "audio/wav";
      if (body.format === "fmp4" && window.MediaSource && MediaSource.isTypeSupported('audio/mp4; codecs="mp4a.40.2"')) {
        await playViaMediaSource(res.body, started);
      } else {
        await playViaBlob(res, mime, started);
      }
    } catch (e) {
      if (e.name !== "AbortError") $("latency").textContent = "error: " + e.message;
    } finally {
      $("speak").disabled = false; $("stop").disabled = true;
    }
  };

  async function playViaBlob(res, mime, started) {
    const reader = res.body.getReader();
    const parts = [];
    let first = null;
    for (;;) {
      const { done, value } = await reader.read();
      if (done) break;
      if (first === null) {
        first = performance.now() - started;
        $("latency").textContent = `first bytes: ${Math.round(first)} ms`;
      }
      parts.push(value);
    }
    const blob = new Blob(parts, { type: mime });
    $("player").src = URL.createObjectURL(blob);
    $("player").play().catch(() => {});
  }

  async function playViaMediaSource(stream, started) {
    const ms = new MediaSource();
    $("player").src = URL.createObjectURL(ms);
    await new Promise((ok) => ms.addEventListener("sourceopen", ok, { once: true }));
    const sb = ms.addSourceBuffer('audio/mp4; codecs="mp4a.40.2"');
    const reader = stream.getReader();
    let first = null;
    $("player").play().catch(() => {});
    for (;;) {
      const { done, value } = await reader.read();
      if (done) break;
      if (first === null) {
        first = performance.now() - started;
        $("latency").textContent = `first audio: ${Math.round(first)} ms`;
      }
      await new Promise((ok) => {
        sb.addEventListener("updateend", ok, { once: true });
        sb.appendBuffer(value);
      });
    }
    if (ms.readyState === "open") ms.endOfStream();
  }

  $("stop").onclick = () => { if (controller) controller.abort(); };

  // ---- status polling -------------------------------------------------------
  async function pollStatus() {
    try {
      const res = await fetch("/system-status", { headers: headers() });
      if (res.ok) $("status").textContent = JSON.stringify(await res.json(), null, 2);
    } catch (e) { /* ignore */ }
  }

  loadSettings();
  refreshVoices();
  pollStatus();
  setInterval(pollStatus, 2000);
  setInterval(refreshVoices, 10000);
})();
