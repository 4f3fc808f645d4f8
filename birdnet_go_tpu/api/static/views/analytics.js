/* Analytics: species ranking, daily trend, hour×date heatmap, confidence
   histogram, diversity, accumulation, new species, dawn onset. */

import { api, el, fmtNum, t, table, isoDaysAgo } from "../app.js";
import { barChart, hBarChart, heatmap, lineChart } from "../charts.js";

export async function analyticsView(outlet) {
  outlet.append(el("h1", {}, t("analytics")));

  // one filter row scoping everything below
  const range = el("select", {},
    el("option", { value: "30" }, t("last30")),
    el("option", { value: "7" }, t("last7")),
    el("option", { value: "90" }, "Last 90 days"),
    el("option", { value: "365" }, t("last_year")));
  outlet.append(el("div", { class: "filters" }, range,
    el("button", { class: "primary", onclick: render }, t("apply"))));

  const grid = el("div", {});
  outlet.append(grid);
  await render();

  async function render() {
    grid.replaceChildren();
    const days = Number(range.value);
    const from = iso(days - 1), to = iso(0);

    const card = (title, node) =>
      el("div", { class: "card" }, el("h2", {}, title), node);

    // period-over-period trend tiles (GetDetectionTrends parity)
    try {
      const tr = await api(`/analytics/trends?days=${days}`);
      const arrow = (pct) => pct == null ? ""
        : ` ${pct >= 0 ? "▲" : "▼"} ${Math.abs(pct)}%`;
      grid.append(el("div", { class: "grid cols-2" },
        el("div", { class: "stat" },
          el("div", { class: "label" }, `Detections (${days}d vs prior)`),
          el("div", { class: "value" },
             `${fmtNum(tr.detections)}${arrow(tr.detections_change_pct)}`)),
        el("div", { class: "stat" },
          el("div", { class: "label" }, `Species (${days}d vs prior)`),
          el("div", { class: "value" },
             `${fmtNum(tr.species)}${arrow(tr.species_change_pct)}`))));
    } catch (e) { /* optional */ }

    // top species (horizontal bars — ranked magnitude, sequential hue)
    try {
      const res = await api(`/analytics/summary?from=${from}&to=${to}`);
      const rows = (Array.isArray(res) ? res : res.species || res.summary || [])
        .slice(0, 12);
      grid.append(card(t("top_species"), hBarChart(rows.map((r) => ({
        label: r.common_name || r.scientific_name, value: r.count })))));
    } catch (e) { grid.append(card(t("top_species"), err(e))); }

    const two = el("div", { class: "grid cols-2" });
    grid.append(two);

    // daily trend
    try {
      const res = await api(`/analytics/daily?from=${from}&to=${to}`);
      const rows = Array.isArray(res) ? res : res.daily || [];
      two.append(card(t("detections_per_day"), lineChart([{
        name: "detections", color: "var(--series-1)", area: true,
        points: rows.map((r) => ({ x: (r.date || "").slice(5),
                                   y: r.count ?? r.total ?? 0 })),
      }])));
    } catch (e) { two.append(card(t("detections_per_day"), err(e))); }

    // confidence histogram
    try {
      const res = await api("/analytics/confidence");
      const bins = Array.isArray(res) ? res : res.bins || res.histogram || [];
      two.append(card(t("confidence_dist"), barChart(bins.map((v, i) => ({
        label: `${(i / bins.length).toFixed(1)}`, value: v })),
        { xLabelEvery: 2, height: 170 })));
    } catch (e) { two.append(card(t("confidence_dist"), err(e))); }

    // date × hour heatmap ({date: int[24]} from the API)
    try {
      const res = await api(`/analytics/heatmap?from=${from}&to=${to}`);
      const dates = Object.keys(res).sort().slice(-21);
      grid.append(card(t("heatmap") + " (date × hour)", dates.length
        ? heatmap({ rows: dates.map((d) => d.slice(5)),
                    cols: [...Array(24).keys()].map(String),
                    values: dates.map((d) => res[d]) })
        : el("div", { class: "empty" }, t("no_data"))));
    } catch (e) { grid.append(card(t("heatmap"), err(e))); }

    const three = el("div", { class: "grid cols-2" });
    grid.append(three);

    // accumulation curve
    try {
      const res = await api(`/analytics/accumulation?from=${from}&to=${to}`);
      const rows = Array.isArray(res) ? res : res.accumulation || [];
      three.append(card(t("accumulation"), lineChart([{
        name: "cumulative species", color: "var(--series-3)",
        points: rows.map((r) => ({ x: (r.date || "").slice(5),
                                   y: r.cumulative_species ?? r.species
                                     ?? r.count ?? 0 })),
      }])));
    } catch (e) { three.append(card(t("accumulation"), err(e))); }

    // diversity tiles ({richness, shannon, detections})
    try {
      const d = await api(`/analytics/diversity?from=${from}&to=${to}`);
      three.append(el("div", { class: "card" },
        el("h2", {}, t("diversity")),
        el("div", { class: "grid cols-2" },
          tile(t("species_richness"), d.richness),
          tile(t("shannon_index"), round2(d.shannon)),
          tile(t("detections"), fmtNum(d.detections)))));
    } catch (e) { three.append(card(t("diversity"), err(e))); }

    // succession: monthly composition (top species share per month)
    try {
      const { succession } = await api(
        `/analytics/succession?from=${from}&to=${to}&top=5`);
      if (succession.length) {
        grid.append(card("Succession (monthly top-5 share)",
          table([t("month"), t("total"), t("top_species")],
            succession.map((m) => [m.month, fmtNum(m.total),
              m.species.map((s) =>
                `${s.common_name || s.scientific_name} `
                + `${Math.round(s.share * 100)}%`).join(" · ")]))));
      }
    } catch (e) { /* optional */ }

    // new species + dawn onset
    const four = el("div", { class: "grid cols-2" });
    grid.append(four);
    try {
      const res = await api("/analytics/species/first-seen");
      const rows = (Array.isArray(res) ? res : res.species || []).slice(0, 10);
      four.append(el("div", { class: "card" },
        el("h2", {}, t("newest_species")),
        table([t("species"), t("first_seen")], rows.map((r) => [
          r.common_name || r.scientific_name, r.first_date || "–"]))));
    } catch (e) { four.append(card(t("newest_species"), err(e))); }
    // dawn chorus: today's hour-of-day activity histogram
    try {
      const { hourly } = await api("/analytics/dawn-chorus");
      four.append(card(t("dawn_chorus") + " (today by hour)",
        barChart((hourly || []).map((v, h) => ({ label: String(h), value: v })),
                 { xLabelEvery: 3, height: 150 })));
    } catch (e) { /* optional */ }
    // database stats + today's rollup (daily events)
    try {
      const [db, ev] = await Promise.all([
        api("/analytics/database/stats"),
        api(`/analytics/daily-events/${iso(0)}`)]);
      four.append(el("div", { class: "card" },
        el("h2", {}, t("database")),
        el("div", { class: "grid cols-2" },
          tile(t("detections"), fmtNum(db.detections)),
          tile(t("species"), fmtNum(db.species)),
          tile(t("first_today"), ev.first_detection || "–"),
          tile(t("last_today"), ev.last_detection || "–"))));
    } catch (e) { /* optional */ }
    try {
      const res = await api(`/analytics/dawn-onset?from=${from}&to=${to}`);
      const rows = (res.dawn_onset || []).slice(-10);
      four.append(el("div", { class: "card" },
        el("h2", {}, t("dawn_onset") + " (min after civil dawn)"),
        rows.length
          ? table([t("date"), t("species"), "Δ dawn (min)"], rows.map((r) => [
              r.date, r.common_name || r.scientific_name,
              String(r.minutes_after_dawn)]))
          : el("div", { class: "empty" }, t("needs_location"))));
    } catch (e) { four.append(card(t("dawn_onset"), err(e))); }
  }

  function tile(label, value) {
    return el("div", { class: "stat" },
      el("div", { class: "label" }, label),
      el("div", { class: "value" }, value ?? "–"));
  }
}

const iso = isoDaysAgo;
function round2(v) { return v == null ? null : Math.round(v * 100) / 100; }
function err(e) { return el("div", { class: "empty" }, e.message); }

