from tpu_sednn.utils.logging import Logger
