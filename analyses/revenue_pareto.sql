-- Ad-hoc analysis: which months carry revenue above a threshold. dbt
-- COMPILES analyses (full Jinja + ref()/var() resolution, dependency
-- validation) but never materializes them — this engine does the same
-- through SqlModels.loadAnalyses/compileAnalysis (plan-only, zero jobs).
-- The reference project declares the directory (analyses/.gitkeep).
select
    order_year_month,
    total_revenue,
    ytd_revenue
from {{ ref('gold_revenue_analysis') }}
where total_revenue > {{ var('analysis_min_revenue', '0') }}
order by total_revenue desc
