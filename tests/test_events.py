

def test_attribution_linear_conserves_value(spark, sf_dir):
    """Multi-touch credit must CONSERVE purchase value: the sum of
    attributed value equals the sum of value over purchases that have at
    least one in-window click (up to 6-dp rounding per credit), and every
    credited click also appears in the pair relation of the last-touch
    model."""
    from serene_spark.functions.sqlgen import SPARK as SP, epoch_us
    from serene_spark.operators.events import ATTRIBUTION_WINDOW_S
    from serene_spark.registry import load_all

    from serene_spark.catalog import register_views

    qs = load_all()
    rows = qs["events_attribution_linear"].spark(spark, sf_dir).collect()
    assert rows
    total_attr = sum(r["attributed_value"] for r in rows)

    register_views(spark, sf_dir, ("events",))
    pus = epoch_us(SP, "p.ts")
    cus = epoch_us(SP, "c.ts")
    expected = spark.sql(f"""
        SELECT SUM(value) AS v, COUNT(*) AS n FROM (
          SELECT DISTINCT p.event_id, p.value
          FROM events p JOIN events c
            ON p.event_type = 'purchase' AND c.event_type = 'click'
           AND p.user_id = c.user_id
           AND {pus} - {cus} BETWEEN 0
               AND CAST({ATTRIBUTION_WINDOW_S} AS BIGINT) * 1000000
        ) t
    """).collect()[0]
    # each credit rounds at 6 dp; error bounded by touches * 5e-7
    assert abs(total_attr - float(expected["v"])) < max(1, expected["n"]) * 1e-4
    # multi-touch credits at least as many clicks as last-touch does
    last_touch_clicks = {
        r["click_id"] for r in qs["events_attribution"].spark(spark, sf_dir).collect()
    }
    linear_clicks = {r["click_id"] for r in rows}
    assert last_touch_clicks <= linear_clicks
