"""Simulation CLI — the ``projective_dynamics/main.py`` equivalent.

Chooses a scripted scenario by name and runs it headlessly (optionally under
an attached viewer callback), recording snapshots when requested."""

from __future__ import annotations

import argparse

from animsnapbases_tpu.config.sim_config import SimConfig
from animsnapbases_tpu.demos.scenarios import SCENARIOS, build_scenario


def cli(argv=None):
    parser = argparse.ArgumentParser(description="Projective dynamics demos")
    parser.add_argument("--example", type=str, default="testing",
                        choices=sorted(SCENARIOS))
    parser.add_argument("--config", type=str,
                        default="configs/demos/testing.json")
    parser.add_argument("--solver", type=str, default=None,
                        choices=("Solver", "animSnapBasesSolver"),
                        help="override the config's solver (the reference "
                             "CLI can override any JSON value; FOM "
                             "recording uses Solver, reduced replay "
                             "animSnapBasesSolver)")
    parser.add_argument("--record", action="store_true",
                        help="record constraint-projection snapshots")
    parser.add_argument("--record-positions", action="store_true",
                        help="also export pos_%%d.off position snapshots")
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--cpu", action="store_true",
                        help="force the JAX CPU backend (the axon plugin "
                             "ignores JAX_PLATFORMS)")
    parser.add_argument("--list", action="store_true",
                        help="list available scenarios and exit")
    args_ns = parser.parse_args(argv)

    if args_ns.list:
        for name in sorted(SCENARIOS):
            print(name)
        return None

    if args_ns.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    params = SimConfig(args_ns.config)
    sim_args = params.build_args()
    if args_ns.solver is not None:
        sim_args.solver = args_ns.solver
    if args_ns.output is not None:
        sim_args.output_dir = args_ns.output

    driver = build_scenario(args_ns.example, sim_args,
                            record_fom_info=args_ns.record, params=params,
                            record_positions=args_ns.record_positions)
    driver.run(max_frames=args_ns.max_frames)
    print(f"scenario '{args_ns.example}' finished at frame "
          f"{driver.solver.frame}")
    return driver


if __name__ == "__main__":
    cli()
