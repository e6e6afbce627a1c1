"""Train bc on chess — wrapper over the unified CLI."""
import sys

from lmrl_gym_tpu.cli.train import main

if __name__ == "__main__":
    main(["--task", "chess_endgames", "--algo", "bc"] + sys.argv[1:])
