"""Train bc on car_dealer — wrapper over the unified CLI."""
import sys

from lmrl_gym_tpu.cli.train import main

if __name__ == "__main__":
    main(["--task", "car_dealer", "--algo", "bc"] + sys.argv[1:])
