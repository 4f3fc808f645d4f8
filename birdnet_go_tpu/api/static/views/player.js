/* Synchronized spectrogram + audio playback (reference SpectrogramPlayer
   .svelte / PlayOverlay.svelte / SpectrogramControls.svelte,
   frontend/src/lib/desktop/components/media): the playhead sweeps across
   the detection's spectrogram while the clip plays, clicking anywhere on
   the image seeks to that fraction of the clip, and the overlay button
   toggles play/pause. Pure DOM — no canvas redraws per frame, just a CSS
   `left` transform on the playhead line. */

import { el, onCleanup, t } from "../app.js";

/** Build a click-to-seek spectrogram player for one detection.
    Returns the wrapper element; `wrap.refreshSpectrogram()` reloads the
    image after a server-side regenerate. */
export function spectrogramPlayer(detId, { size = "lg" } = {}) {
  const img = el("img", { alt: "spectrogram", draggable: "false",
    src: `/api/v2/spectrogram/${detId}?size=${size}` });
  const head = el("div", { class: "playhead" });
  const btn = el("button", { class: "play-overlay",
                             "aria-label": t("listen") }, "▶");
  const clock = el("span", { class: "play-clock" }, "");
  const audio = el("audio", { preload: "metadata",
    src: `/api/v2/audio/${detId}` });
  const wrap = el("div", { class: "spec-player" },
                  img, head, btn, clock, audio);

  // a missing spectrogram must not kill the audio controls, and
  // Regenerate must be able to bring the image back
  const noImg = el("div", { class: "empty" }, t("no_spectrogram"));
  img.addEventListener("error", () => {
    img.style.display = "none";
    head.style.display = "none";
    if (!noImg.isConnected) wrap.prepend(noImg);
  });
  img.addEventListener("load", () => {
    img.style.display = "";
    head.style.display = "";
    noImg.remove();
  });
  audio.addEventListener("error", () => { btn.remove(); clock.remove(); });

  // click on the image seeks; the x fraction maps to clip time
  wrap.addEventListener("click", (ev) => {
    if (ev.target === btn) return;
    const r = img.getBoundingClientRect();
    if (!r.width || !isFinite(audio.duration) || !audio.duration) return;
    const frac = Math.min(1, Math.max(0, (ev.clientX - r.left) / r.width));
    audio.currentTime = frac * audio.duration;
    paint();
    if (audio.paused) toggle();
  });
  btn.addEventListener("click", (ev) => { ev.stopPropagation(); toggle(); });

  let raf = 0;
  const paint = () => {
    if (!isFinite(audio.duration) || !audio.duration) return;
    const frac = audio.currentTime / audio.duration;
    head.style.left = `${(frac * 100).toFixed(2)}%`;
    clock.textContent = `${audio.currentTime.toFixed(1)}s / `
      + `${audio.duration.toFixed(1)}s`;
  };
  const tick = () => {
    paint();
    if (!audio.paused) raf = requestAnimationFrame(tick);
  };
  audio.addEventListener("play", () => {
    btn.textContent = "⏸";
    // keep the playhead hidden while the spectrogram is missing — an
    // orphan line would sweep across the placeholder box
    if (img.style.display !== "none") head.style.display = "";
    raf = requestAnimationFrame(tick);
  });
  audio.addEventListener("pause", () => {
    btn.textContent = "▶";
    cancelAnimationFrame(raf);
    paint();
  });
  audio.addEventListener("ended", () => {
    btn.textContent = "▶";
    head.style.left = "0";
  });
  // navigation must stop playback — a detached <audio> keeps playing
  onCleanup(() => { audio.pause(); cancelAnimationFrame(raf); });

  function toggle() {
    if (audio.paused) audio.play().catch(() => {});
    else audio.pause();
  }
  wrap.refreshSpectrogram = () => {
    img.src = `/api/v2/spectrogram/${detId}?size=${size}&_=${Date.now()}`;
  };
  wrap.stopPlayback = () => audio.pause();
  return wrap;
}
