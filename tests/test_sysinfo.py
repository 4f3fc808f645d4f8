"""Environment detection over injected fake roots (sysinfo parity —
reference environment_test.go builds the same fixture trees)."""

import os

import pytest

from birdnet_go_tpu.utils.sysinfo import (
    cpu_arch,
    detect_environment,
    environment_summary,
    is_container_env,
    probe_external_mount,
    process_rss_bytes,
)


def _mk(root, rel, content=""):
    p = root / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(content)


def test_detect_docker_sentinel(tmp_path):
    _mk(tmp_path, ".dockerenv")
    assert detect_environment(str(tmp_path)) == ("Docker", "")


def test_detect_podman_sentinel(tmp_path):
    _mk(tmp_path, "run/.containerenv")
    assert detect_environment(str(tmp_path)) == ("Podman", "")


def test_detect_from_cgroup(tmp_path):
    _mk(tmp_path, "proc/self/cgroup",
        "0::/system.slice/docker-abc123.scope\n")
    assert detect_environment(str(tmp_path))[0] == "Docker"
    _mk(tmp_path, "proc/self/cgroup", "0::/lxc/mycontainer\n")
    assert detect_environment(str(tmp_path))[0] == "LXC"


def test_detect_systemd_container_marker(tmp_path):
    _mk(tmp_path, "run/systemd/container", "systemd-nspawn\n")
    assert detect_environment(str(tmp_path))[0] == "systemd-nspawn"
    _mk(tmp_path, "run/systemd/container", "weird-rt\n")
    env, detail = detect_environment(str(tmp_path))
    assert env == "Container" and detail == "weird-rt"


def test_detect_wsl2(tmp_path):
    _mk(tmp_path, "proc/version",
        "Linux version 5.15.90.1-microsoft-standard-WSL2\n".lower())
    assert detect_environment(str(tmp_path))[0] == "WSL2"
    # WSL1 ('Microsoft' without standard-wsl) is NOT WSL2
    _mk(tmp_path, "proc/version", "Linux 4.4.0 Microsoft\n")
    assert detect_environment(str(tmp_path))[0] != "WSL2"


@pytest.mark.parametrize("vendor,product,expect", [
    ("QEMU", "Standard PC", "KVM"),
    ("VMware, Inc.", "VMware Virtual Platform", "VMware"),
    ("Microsoft Corporation", "Virtual Machine", "Hyper-V"),
    ("innotek GmbH", "VirtualBox", "VirtualBox"),
    ("Xen", "HVM domU", "Xen"),
])
def test_detect_hypervisors_from_dmi(tmp_path, vendor, product, expect):
    _mk(tmp_path, "sys/class/dmi/id/sys_vendor", vendor + "\n")
    _mk(tmp_path, "sys/class/dmi/id/product_name", product + "\n")
    env, detail = detect_environment(str(tmp_path))
    assert env == expect and detail == product


def test_detect_hypervisor_flag_then_bare_metal(tmp_path):
    _mk(tmp_path, "proc/cpuinfo",
        "processor: 0\nflags\t\t: fpu vme hypervisor sse\n")
    assert detect_environment(str(tmp_path))[0] == "Virtual Machine"
    _mk(tmp_path, "proc/cpuinfo",
        "processor: 0\nflags\t\t: fpu vme sse\n")
    assert detect_environment(str(tmp_path))[0] == "Bare Metal"


def test_container_ordering_sentinel_beats_dmi(tmp_path):
    # a Docker container ON a KVM host reports Docker (containers first)
    _mk(tmp_path, ".dockerenv")
    _mk(tmp_path, "sys/class/dmi/id/sys_vendor", "QEMU\n")
    _mk(tmp_path, "sys/class/dmi/id/product_name", "pc\n")
    assert detect_environment(str(tmp_path))[0] == "Docker"


def test_is_container_env():
    for e in ("Docker", "Podman", "LXC", "systemd-nspawn", "Container"):
        assert is_container_env(e)
    for e in ("KVM", "WSL2", "Bare Metal", "Native"):
        assert not is_container_env(e)


def test_arm_variant_from_cpuinfo(tmp_path, monkeypatch):
    import platform

    monkeypatch.setattr(platform, "machine", lambda: "armv7l")
    _mk(tmp_path, "proc/cpuinfo", "CPU architecture: 7\n")
    assert cpu_arch(str(tmp_path)) == "armv7l"
    _mk(tmp_path, "proc/cpuinfo", "CPU architecture: 6\n")
    assert cpu_arch(str(tmp_path)) == "armv6l"


def test_external_mount_probe(tmp_path):
    missing = probe_external_mount(str(tmp_path / "nope"))
    assert missing == {"exists": False, "is_mountpoint": False,
                       "readable": False}
    d = tmp_path / "media"
    d.mkdir()
    r = probe_external_mount(str(d))
    # a plain subdirectory shares the parent's device: not a mountpoint
    assert r["exists"] and r["readable"] and not r["is_mountpoint"]
    # /proc IS a distinct mount from /
    if os.path.isdir("/proc"):
        assert probe_external_mount("/proc")["is_mountpoint"]


def test_rss_and_summary():
    rss = process_rss_bytes()
    assert rss > 10 * 1024 * 1024          # a live CPython is >10 MB
    s = environment_summary()
    assert s["environment"]
    assert s["kernel"]
    assert s["process_rss_bytes"] == pytest.approx(rss, rel=0.5)
    assert isinstance(s["is_container"], bool)
