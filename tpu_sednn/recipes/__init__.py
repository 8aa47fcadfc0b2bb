from tpu_sednn.recipes.finetune_nat import RecipeConfig, run_recipe, recipe_opt_schedule
from tpu_sednn.recipes.artifact import load_run_dir
