#!/usr/bin/env python3
"""rtl_tcp network IQ source with multi-client fan-out.

Parity utility for the reference's rtltcp.py (rtltcp.py:32-63 command enum,
:74-77 tuner init, :106-198 broadcast server, :201-236 REPL), re-implemented
for this framework with stdlib only (argparse/socket/threading — no typer):
connects to an rtl_tcp daemon, applies initial tuner setup, re-broadcasts
the uint8 IQ stream to any number of local clients (each of which can pipe
into `python -m demodulator_tpu -i - ...`), and offers an interactive
command prompt for retuning.

    python tools/rtltcp.py HOST PORT [--listen-port 12345] [--rate 250000]

Commands at the prompt:  <name> <value>  with names from COMMANDS
(e.g. `frequency 94900000`, `gain 280`, `agc 1`), `help`, `quit`.
"""
from __future__ import annotations

import argparse
import queue
import socket
import struct
import sys
import threading

# rtl_tcp wire protocol: one byte command + big-endian uint32 argument.
# Numbering per the public rtl_tcp protocol (also mirrored by the
# reference's enum, rtltcp.py:32-63).
COMMANDS = {
    "frequency": 0x01,
    "sample_rate": 0x02,
    "gain_mode": 0x03,          # 0 auto, 1 manual
    "gain": 0x04,               # tenths of dB
    "freq_correction": 0x05,
    "if_gain": 0x06,
    "test_mode": 0x07,
    "agc": 0x08,
    "direct_sampling": 0x09,
    "offset_tuning": 0x0a,
    "rtl_xtal": 0x0b,
    "tuner_xtal": 0x0c,
    "tuner_gain_by_index": 0x0d,
    "bias_tee": 0x0e,
    # extended set (rtl_tcp forks / librtlsdr extras; the reference's enum
    # carries the same values, rtltcp.py:32-63)
    "tuner_bandwidth": 0x40,
    "udp_establish": 0x41,
    "udp_terminate": 0x42,
    "i2c_tuner_register": 0x43,
    "i2c_tuner_override": 0x44,
    "tuner_bw_if_center": 0x45,
    "tuner_if_mode": 0x46,
    "sideband": 0x47,
    "report_i2c_regs": 0x48,
    "gpio_set_output_mode": 0x49,
    "gpio_set_input_mode": 0x50,
    "gpio_get_io_status": 0x51,
    "gpio_write_pin": 0x52,
    "gpio_read_pin": 0x53,
    "gpio_get_byte": 0x54,
    "is_tuner_pll_locked": 0x55,
    "freq_hi32": 0x56,
}


def send_command(sock: socket.socket, name: str, value: int) -> None:
    sock.sendall(struct.pack(">BI", COMMANDS[name], value & 0xFFFFFFFF))


class FanOutServer:
    """Single-producer broadcast: one rtl_tcp upstream, N downstream clients.

    The reference uses a depth-1 queue plus a deque of client sockets
    (rtltcp.py:106-198); here each client gets its own bounded queue so one
    slow client drops its own data instead of stalling the rest."""

    def __init__(self, upstream: socket.socket, listen_port: int,
                 chunk: int = 8192, depth: int = 64):
        self.upstream = upstream
        self.chunk = chunk
        self.depth = depth
        self.clients: dict[socket.socket, queue.Queue] = {}
        self.lock = threading.Lock()
        self.alive = True
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind(("127.0.0.1", listen_port))
        self.listener.listen(8)
        self.port = self.listener.getsockname()[1]
        for fn in (self._accept_loop, self._produce_loop):
            threading.Thread(target=fn, daemon=True).start()

    def _accept_loop(self):
        while self.alive:
            try:
                c, addr = self.listener.accept()
            except OSError:
                return
            q: queue.Queue = queue.Queue(maxsize=self.depth)
            with self.lock:
                self.clients[c] = q
            threading.Thread(target=self._client_loop, args=(c, q),
                             daemon=True).start()
            print(f"client {addr} connected ({len(self.clients)} total)",
                  file=sys.stderr)

    def _produce_loop(self):
        while self.alive:
            try:
                data = self.upstream.recv(self.chunk)
            except OSError:
                data = b""
            if not data:
                self.alive = False
                with self.lock:
                    for q in self.clients.values():
                        try:
                            q.put_nowait(None)
                        except queue.Full:
                            pass
                return
            with self.lock:
                sinks = list(self.clients.values())
            for q in sinks:
                try:
                    q.put_nowait(data)
                except queue.Full:
                    pass  # slow client: drop its chunk, never stall others

    def _client_loop(self, c: socket.socket, q: queue.Queue):
        try:
            while self.alive:
                data = q.get()
                if data is None:
                    break
                c.sendall(data)
        except OSError:
            pass
        finally:
            with self.lock:
                self.clients.pop(c, None)
            c.close()
            print(f"client disconnected ({len(self.clients)} left)",
                  file=sys.stderr)

    def close(self):
        self.alive = False
        self.listener.close()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("host")
    ap.add_argument("port", type=int)
    ap.add_argument("--listen-port", type=int, default=12345)
    ap.add_argument("--rate", type=int, default=250000)
    ap.add_argument("--frequency", type=int, default=0)
    ap.add_argument("--gain-mode", type=int, default=0)
    ap.add_argument("--no-repl", action="store_true",
                    help="serve until upstream closes, no prompt")
    args = ap.parse_args(argv)

    rs = socket.create_connection((args.host, args.port))
    # initial tuner setup (reference does gain mode/AGC/bias-tee/rate,
    # rtltcp.py:74-77)
    send_command(rs, "gain_mode", args.gain_mode)
    send_command(rs, "agc", 1 if args.gain_mode == 0 else 0)
    send_command(rs, "bias_tee", 0)
    send_command(rs, "sample_rate", args.rate)
    if args.frequency:
        send_command(rs, "frequency", args.frequency)

    srv = FanOutServer(rs, args.listen_port)
    print(f"serving IQ fan-out on 127.0.0.1:{srv.port}", file=sys.stderr)

    if args.no_repl:
        try:
            while srv.alive:
                threading.Event().wait(0.5)
        except KeyboardInterrupt:
            pass
        srv.close()
        return 0

    try:
        while srv.alive:
            try:
                line = input("rtltcp> ").strip()
            except EOFError:
                break
            if not line:
                continue
            if line in ("quit", "exit"):
                break
            if line == "help":
                print(" ".join(sorted(COMMANDS)))
                continue
            parts = line.split()
            if len(parts) != 2 or parts[0] not in COMMANDS:
                print(f"usage: <command> <value>; commands: "
                      f"{' '.join(sorted(COMMANDS))}")
                continue
            try:
                send_command(rs, parts[0], int(parts[1], 0))
            except (ValueError, OSError) as e:
                print(f"error: {e}")
    except KeyboardInterrupt:
        pass
    srv.close()
    rs.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
